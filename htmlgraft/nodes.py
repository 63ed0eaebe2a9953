"""DOM node types (reference: /root/reference/lib/dom.js).

Children-array-only tree, no parent/sibling pointers (dom.js:11).  Text is
plain ``str`` children; Comment/Doctype keep their data as a list of chunks
(dom.js:29-39).  Element.attrs is ``None`` until the first attribute is set
(the reference only assigns ``attrs`` when truthy, dom.js:27-28).
"""

from __future__ import annotations


class Document:
    __slots__ = ("children", "head", "body")

    def __init__(self):
        self.children = []
        self.head = None
        self.body = None


class Element:
    __slots__ = ("name", "attrs", "children", "selfclose")

    def __init__(self, name: str, attrs=None):
        self.name = name
        self.attrs = attrs if attrs else None
        self.children = []
        self.selfclose = False

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Element {self.name} {self.attrs} {self.children}>"


class EndTag:
    # attrs/selfclose: the tokeniser parses attributes on end tags too and
    # assigns them onto the token object (JS objects take any property);
    # the parser ignores them.
    __slots__ = ("name", "attrs", "selfclose")
    type = "EndTag"

    def __init__(self, name: str):
        self.name = name
        self.attrs = None
        self.selfclose = False


class Comment:
    __slots__ = ("data",)
    type = "Comment"

    def __init__(self):
        self.data = []


class Doctype:
    __slots__ = ("data",)
    type = "Doctype"

    def __init__(self):
        self.data = []
