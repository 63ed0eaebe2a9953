"""htmlgraft: PySpark-native HTML5 parsing + main-content extraction engine.

A from-scratch re-implementation of the parsing semantics of
alwinb/html-parser (reference at /root/reference, v0.14.0) as a distributed
Spark pipeline: WHATWG-style tokenizer + schema-directed tree construction +
DOM-heuristic main-text extraction, run as Arrow-batched ``mapInPandas``
stages over tables of Common-Crawl-style pages.
"""

from .nodes import Comment, Doctype, Document, Element, EndTag
from .parse import Parser, parse
from .lexer import Tokeniser, LexerError
from .walk import print_tree, traverse, coalesce, tree_to_jsonable

version = "0.1.0"

__all__ = [
    "Comment", "Doctype", "Document", "Element", "EndTag",
    "Parser", "parse", "Tokeniser", "LexerError",
    "print_tree", "traverse", "coalesce", "tree_to_jsonable",
    "version",
]
