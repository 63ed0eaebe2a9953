"""HTML tokeniser: double loop driving a table-based DFA.

Re-implements the reference tokeniser (/root/reference/lib/tokeniser.js) over
the extracted DFA tables (``_tables.py``).  The inner loop runs the DFA with
longest-match semantics (tokeniser.js:114-130); the outer loop dispatches on
the lexical token type and assembles start/end tags, comments, doctypes and
character references (tokeniser.js:132-382), calling the delegate's
``write_tag / write_end_tag / write_data / write_space / write_comment /
write_doctype / write_eof`` methods.  Each delegate call returns the current
parser context bitvector (the tree builder's ``tip.kind``), which selects the
next DFA start state (RawText/RcData vs Main, foreign-content suppression of
the content map; tokeniser.js:175-179, 265-268).

Performance: for the hot "run" states (Main text, rawtext, rcdata, quoted
values, comment/bogus data) a compiled regex extends the token in C instead of
stepping the DFA per character.  The regexes are equivalent to the DFA's
longest match from those states; where they may split a run that the DFA
would lex as one token (comment data around '-') the outer loop accumulates
chunks so the result is identical.  Equivalence with the generic DFA loop is
asserted in tests/test_lexer.py.

Deliberate reference quirks preserved:
* The char U+0080 hits index 128 of the 128-entry eqClass table (undefined in
  JS) and ultimately raises a lexer error (tokeniser.js:121 with
  dfa.js:22-39; verified under Node).
* Newline normalisation: CR, CRLF, LF all emit '\\n' (tokeniser.js:140-164).
* Named character references are the reference's deliberately tiny subset
  (tokeniser.js:435-443) -- using the full WHATWG list would break fixture
  identity.
* ``<plaintext>`` tokenises as Main: the reference's ``S.PlainText`` is
  undefined at runtime (tokeniser.js:22 reads the non-existent ``S.TOP``).
* Attribute first-write-wins uses the JS ``in`` operator, which sees
  Object.prototype keys (tokeniser.js:239) -- an attribute named ``toString``
  etc. is always "already present" and ignored.
"""

from __future__ import annotations

import re

from . import _tables as T
from .grammar import C, JS_PROTO_KEYS
from .nodes import Comment, Doctype, Element, EndTag

_TOK = T.TOKENS
_S = T.STATES

# token ids
_errorToken = _TOK["errorToken"]
_data = _TOK["data"]
_rawtext = _TOK["rawtext"]
_rcdata = _TOK["rcdata"]
_nulls = _TOK["nulls"]
_space = _TOK["space"]
_newline = _TOK["newline"]
_amp = _TOK["amp"]
_lt = _TOK["lt"]
_charRefDecimal = _TOK["charRefDecimal"]
_charRefHex = _TOK["charRefHex"]
_charRefNamed = _TOK["charRefNamed"]
_charRefLegacy = _TOK["charRefLegacy"]
_mDeclStart = _TOK["mDeclStart"]
_commentStart = _TOK["commentStart"]
_commentData = _TOK["commentData"]
_commentEnd = _TOK["commentEnd"]
_bogusStart = _TOK["bogusStart"]
_bogusData = _TOK["bogusData"]
_bogusEnd = _TOK["bogusEnd"]
_startTag = _TOK["startTag"]
_endTag = _TOK["endTag"]
_startTag_ = _TOK["startTag_"]
_endTag_ = _TOK["endTag_"]
_startTagStart = _TOK["startTagStart"]
_endTagStart = _TOK["endTagStart"]
_startTagStart_ = _TOK["startTagStart_"]
_endTagStart_ = _TOK["endTagStart_"]
_tagEnd = _TOK["tagEnd"]
_attrSpace = _TOK["attrSpace"]
_attrSpaceNL = _TOK["attrSpaceNL"]
_commentDataNL = _TOK["commentDataNL"]
_tagSpace = _TOK["tagSpace"]
_tagSpaceNL = _TOK["tagSpaceNL"]
_attributeName_ = _TOK["attributeName_"]
_attributeName = _TOK["attributeName"]
_attributeAssign = _TOK["attributeAssign"]
_valueStartApos = _TOK["valueStartApos"]
_valueStartQuot = _TOK["valueStartQuot"]
_valueEnd = _TOK["valueEnd"]
_unquoted = _TOK["unquoted"]
_squoted = _TOK["squoted"]
_quoted = _TOK["quoted"]

# states
S_FAIL = _S["Fail"]
S_MAIN = _S["Main"]
S_RCDATA = _S["RcData"]
S_RAWTEXT = _S["RawText"]
S_BEFORE_ATTRIBUTE = _S["BeforeAttribute"]
S_BEFORE_ASSIGN = _S["BeforeAssign"]
S_BEFORE_VALUE = _S["BeforeValue"]
S_BEFORE_COMMENT_DATA = _S["BeforeCommentData"]
S_IN_COMMENT_DATA = _S["InCommentData"]
S_IN_BOGUS_COMMENT = _S["InBogusComment"]
S_VALUE_QUOTED = _S["ValueQuoted"]
S_VALUE_APOSED = _S["ValueAposed"]
S_VALUE_UNQUOTED = _S["ValueUnquoted"]

_EQ = T.EQ_CLASS
_TABLE = T.TABLE
_W = T.TABLE_WIDTH
_MIN_ACCEPTS = T.MIN_ACCEPTS
_FOREIGN = C["ForeignElement"]

# Content map (tokeniser.js:38-50); note 'plaintext' is absent on purpose,
# see module docstring.
_CONTENT_MAP = {
    "style": S_RAWTEXT,
    "script": S_RAWTEXT,
    "xmp": S_RAWTEXT,
    "iframe": S_RAWTEXT,
    "noembed": S_RAWTEXT,
    "noframes": S_RAWTEXT,
    "textarea": S_RCDATA,
    "title": S_RCDATA,
}

_TAGISH = re.compile(r"[?/!a-zA-Z]")

# --- fast-path run regexes (see module docstring) ---
# (token_type, compiled_regex) per entry state; Main has two alternatives.
_RE_MAIN = re.compile("(?:[^\x00\r\n\t &<\x80]+)|(?P<sp>[\t ]+)")
_RE_RAW = re.compile("[^\x00\r\n<\x80]+")
_RE_RCD = re.compile("[^\x00\r\n<&\x80]+")
_RE_VALQ = re.compile('[^\x00\r\n"&\x80]+')
_RE_VALS = re.compile("[^\x00\r\n'&\x80]+")
_RE_BOG = re.compile("[^\x00\r\n>\x80]+")
_RE_CMT = re.compile("[^\x00\r\n\x80-]+")
# ValueUnquoted: first char must not divert (CR LF ws & > /), continuation
# additionally allows '/' (dfa.js rows ValueUnquoted/Val).
_RE_VALU = re.compile("[^\r\n\t &>/\x80][^\r\n\t &>\x80]*")

# Merged text run (perf): when the delegate's ``can_merge_text()`` confirms
# that in the CURRENT tree context a space token and a data token are
# appended identically (content accepts both, no foster trap, no sibling
# rules, no table space re-kinding, empty formatting list), a whole
# words-and-spaces run is lexed as ONE data token instead of alternating
# data/space tokens.  The run must contain at least one non-space char:
# pure-space runs keep their space token so C.SPACE-vs-C.TEXT bookkeeping
# (FramesetOK / allOpened) stays exact.  Tree output is identical because
# adjacent text children are coalesced by every consumer.
_RE_MERGED = re.compile("[\t ]*[^\x00\r\n\t &<\x80][^\x00\r\n&<\x80]*")

# Whole-tag fast path (perf): a single C-level regex matches an ENTIRE
# common-shape tag — lowercase name, attributes with quoted/unquoted values —
# replacing ~4-6 outer-loop iterations per attribute with one.  The character
# classes are deliberately CONSERVATIVE SUBSETS of what the DFA accepts
# (lowercase-only names, no newline inside the tag so line counting stays
# exact, no NUL / CR / U+0080 / '&' anywhere): any tag the regex cannot match
# falls through to the generic DFA loop, so the fast path can only ever agree
# with it.  Verified semantics it replicates exactly (probed against the
# generic path; equivalence-tested in tests/test_lexer_goldens.py):
# * attr spaces around '=' bind the value ('x = 1' -> x=1);
# * unquoted values take every non-space/>&-char including '/', '<', quotes;
# * first-name-wins incl. the JS Object.prototype-key quirk;
# * tag.attrs is created (possibly staying empty) iff >=1 attr name was seen;
# * selfclose iff the char directly before '>' is '/', EVEN when that '/'
#   also belongs to an unquoted value (the reference checks input[end-2]).
# NB unquoted values: a LEADING quote always starts a quoted value in the
# DFA (an unterminated one swallows the rest of the input), so the unquoted
# alternative must not accept it as a first char — only as a continuation.
_FT_VAL = (
    "\"[^\x00\r\n\"&\x80]*\""
    "|'[^\x00\r\n'&\x80]*'"
    "|[^\x00\r\n\t &>\x80\"'][^\x00\r\n\t &>\x80]*"
)
_RE_FASTSTART = re.compile(
    "<([a-z][a-z0-9]*)"
    "((?:[\t ]+[a-z][a-z0-9_:.\\-]*(?:[\t ]*=[\t ]*(?:" + _FT_VAL + "))?)*)"
    "[\t ]*/?>"
)
_RE_FASTEND = re.compile("</([a-z][a-z0-9]*)>")
_RE_FASTATTR = re.compile(
    "([a-z][a-z0-9_:.\\-]*)(?:[\t ]*=[\t ]*"
    "(?:\"([^\x00\r\n\"&\x80]*)\"|'([^\x00\r\n'&\x80]*)'"
    "|([^\x00\r\n\t &>\x80\"'][^\x00\r\n\t &>\x80]*)))?"
)


class LexerError(SyntaxError):
    pass


_HEX_DIGITS = set("0123456789abcdefABCDEF")
_DEC_DIGITS = set("0123456789")


def _parse_numeric(s: str, base: int) -> str:
    # tokeniser.js:418-427; JS parseInt takes the longest valid digit prefix
    # (the DFA-lexed slice may include the terminating ';').
    digits = _HEX_DIGITS if base == 16 else _DEC_DIGITS
    i = 0
    n_ = len(s)
    while i < n_ and s[i] in digits:
        i += 1
    n = int(s[:i], base)
    if 0x80 <= n <= 0x9F:
        return _WIN1252[n - 0x80]
    if 0xD800 <= n <= 0xDFFF:
        return "�"
    if 1 <= n <= 0x10FFFF:
        return chr(n)
    return "�"


_WIN1252 = (
    "€\x81‚ƒ„…†‡ˆ‰Š‹"
    "Œ\x8dŽ\x8f\x90‘’“”•–—"
    "˜™š›œ\x9džŸ"
)

# tokeniser.js:435-443 -- deliberately tiny subset, do not extend.
_NAMED_REFS = {
    "lt": "<", "LT": "<", "lt;": "<", "LT;": "<",
    "gt": ">", "GT": ">", "gt;": ">", "GT;": ">",
    "amp": "&", "AMP": "&", "amp;": "&", "AMP;": "&",
    "quot": '"', "QUOT": '"', "quot;": '"', "QUOT;": '"',
    "apos;": "'",
    "notin;": "∉",
}


def _lowercase_equiv(s1: str, s2: str) -> bool:
    if len(s1) != len(s2):
        return False
    for a, b in zip(s1, s2):
        if (ord(a) | 32) != (ord(b) | 32):
            return False
    return True


class Tokeniser:
    """Push tokeniser; ``parse(input)`` == ``write(input); end()``."""

    __slots__ = (
        "delegate", "can_merge", "token_state", "anchor", "end", "pos",
        "line", "lastnl", "parser_context", "last_start_tag", "tag", "attr",
        "emit",
    )

    def __init__(self, delegate):
        self.delegate = delegate
        self.can_merge = getattr(delegate, "can_merge_text", None)
        self._reset()

    def _reset(self):
        self.token_state = T.INITIAL_STATE
        self.anchor = self.end = self.pos = 0
        self.line = 1
        self.lastnl = 0
        self.parser_context = 0
        self.last_start_tag = ""
        self.tag = None
        self.attr = None
        self.emit = None

    def parse(self, input_: str):
        self.write(input_)
        self.end_input()

    def end_input(self):
        if isinstance(self.tag, Comment):
            self.delegate.write_comment(self.tag)
        self.delegate.write_eof()
        self._reset()

    def write(self, s: str) -> None:  # noqa: C901 - mirrors the reference switch
        length = len(s)
        delegate = self.delegate
        can_merge = self.can_merge
        table = _TABLE
        eq = _EQ
        pos = self.pos
        anchor = self.anchor
        end = self.end
        token_state = self.token_state
        tag = self.tag
        attr = self.attr

        while pos < length:
            # --- fast path: extend run tokens with a C-level regex ---
            token_type = 0
            if token_state == S_MAIN:
                # one char peek gates the regex attempts: at '<' the text
                # regexes always fail, elsewhere the tag regexes always
                # fail — skip the guaranteed-miss C calls
                if s[pos] != "<":
                    if tag is None and can_merge is not None and can_merge():
                        m = _RE_MERGED.match(s, pos)
                        if m is not None:
                            end = m.end()
                            token_type = _data
                    if not token_type:
                        m = _RE_MAIN.match(s, pos)
                        if m is not None:
                            end = m.end()
                            token_type = _space if m.lastgroup == "sp" else _data
            elif token_state == S_RAWTEXT:
                m = _RE_RAW.match(s, pos)
                if m is not None:
                    end = m.end()
                    token_type = _rawtext
            elif token_state == S_RCDATA:
                m = _RE_RCD.match(s, pos)
                if m is not None:
                    end = m.end()
                    token_type = _rcdata
            elif token_state == S_VALUE_QUOTED:
                m = _RE_VALQ.match(s, pos)
                if m is not None:
                    end = m.end()
                    token_type = _quoted
            elif token_state == S_VALUE_APOSED:
                m = _RE_VALS.match(s, pos)
                if m is not None:
                    end = m.end()
                    token_type = _squoted
            elif token_state == S_IN_COMMENT_DATA:
                m = _RE_CMT.match(s, pos)
                if m is not None:
                    end = m.end()
                    token_type = _commentData
            elif token_state == S_IN_BOGUS_COMMENT:
                m = _RE_BOG.match(s, pos)
                if m is not None:
                    end = m.end()
                    token_type = _bogusData
            elif token_state == S_VALUE_UNQUOTED:
                m = _RE_VALU.match(s, pos)
                if m is not None:
                    end = m.end()
                    token_type = _unquoted

            if token_type:
                pos = end
            else:
                # --- whole-tag fast path (see _RE_FASTSTART above) ---
                if token_state == S_MAIN and tag is None and s[pos] == "<":
                    nxt = s[pos + 1] if pos + 1 < length else ""
                    m = _RE_FASTSTART.match(s, pos) if nxt != "/" else None
                    if m is not None:
                        name = m.group(1)
                        mend = m.end()
                        self.last_start_tag = name
                        el = Element(name)
                        raw_attrs = m.group(2)
                        if raw_attrs:
                            attrs = el.attrs = {}
                            for am in _RE_FASTATTR.finditer(raw_attrs):
                                an = am.group(1)
                                if an in attrs or an in JS_PROTO_KEYS:
                                    continue
                                v = am.group(2)
                                if v is None:
                                    v = am.group(3)
                                    if v is None:
                                        v = am.group(4)
                                        if v is None:
                                            v = ""
                                attrs[an] = v
                        if s[mend - 2] == "/":
                            el.selfclose = True
                        anchor = end = pos = mend
                        self._sync(pos, anchor, end, token_state, None, None)
                        pc = delegate.write_tag(el)
                        self.parser_context = pc
                        token_state = (
                            _CONTENT_MAP.get(name, S_MAIN)
                            if not (pc & _FOREIGN) else S_MAIN
                        )
                        continue
                    m = _RE_FASTEND.match(s, pos)
                    if m is not None:
                        anchor = end = pos = m.end()
                        self._sync(pos, anchor, end, token_state, None, None)
                        self.parser_context = delegate.write_end_tag(
                            EndTag(m.group(1))
                        )
                        continue
                # --- generic DFA longest-match loop (tokeniser.js:114-130) ---
                state = token_state
                match = S_FAIL
                while state > 0 and pos < length:
                    c = ord(s[pos])
                    pos += 1
                    if c <= 127:
                        cc = eq[c]
                    elif c == 128:
                        # eqClass[128] is undefined in JS -> transition to
                        # 'undefined', loop exits without accepting.
                        break
                    else:
                        cc = 4  # defaultClass
                    state = table[state * _W + cc]
                    if state >= _MIN_ACCEPTS:
                        match = state
                        end = pos
                token_type = table[match * _W]

            # --- outer switch (tokeniser.js:132-382) ---
            if token_type == _data or token_type == _rawtext or token_type == _rcdata \
                    or token_type == _amp or token_type == _lt:
                if attr is not None:
                    attr[1] += s[anchor:end]
                else:
                    delegate.write_data(s[anchor:end])

            elif token_type == _space:
                if tag is None:
                    if end < length and s[end] == "<":
                        nxt = s[end + 1] if end + 1 < length else None
                        # JS: /[?/!a-zA-Z]/.test(input[end+1]) -- out-of-range
                        # yields the string "undefined", which matches.
                        tagish = True if nxt is None else bool(_TAGISH.search(nxt))
                        allow_foster = not tagish
                    else:
                        allow_foster = True
                    self._sync(pos, anchor, end, token_state, tag, attr)
                    delegate.write_space(s[anchor:end], allow_foster)
                elif attr is not None:
                    attr[1] += s[anchor:end]

            elif token_type == _newline:
                self.lastnl = pos
                self.line += 1
                if tag is None:
                    self._sync(pos, anchor, end, token_state, tag, attr)
                    delegate.write_space("\n")  # newline normalisation
                elif attr is not None:
                    attr[1] += "\n"

            elif token_type == _startTag or token_type == _startTag_:
                name = s[anchor + 1 : end - 1]
                if token_type == _startTag_:
                    name = name.lower()
                self.last_start_tag = name
                self._sync(pos, anchor, end, token_state, tag, attr)
                pc = delegate.write_tag(Element(name))
                self.parser_context = pc
                token_state = (
                    _CONTENT_MAP.get(name, S_MAIN) if not (pc & _FOREIGN) else S_MAIN
                )
                tag = attr = None

            elif token_type == _startTagStart or token_type == _startTagStart_:
                name = s[anchor + 1 : end]
                if token_type == _startTagStart_:
                    name = name.lower()
                self.last_start_tag = name
                tag = Element(name)
                self.emit = "tag"
                token_state = S_BEFORE_ATTRIBUTE

            elif token_type == _endTag or token_type == _endTag_:
                name = s[anchor + 2 : end - 1]
                if token_type == _endTag_:
                    name = name.lower()
                if token_state == S_MAIN or self.last_start_tag == name:
                    self._sync(pos, anchor, end, token_state, tag, attr)
                    self.parser_context = delegate.write_end_tag(EndTag(name))
                    token_state = S_MAIN
                    tag = attr = None
                else:
                    delegate.write_data(s[anchor:end])

            elif token_type == _endTagStart or token_type == _endTagStart_:
                name = s[anchor + 2 : end]
                if token_type == _endTagStart_:
                    name = name.lower()
                if token_state == S_MAIN or self.last_start_tag == name:
                    tag = EndTag(name)
                    self.emit = "end_tag"
                    token_state = S_BEFORE_ATTRIBUTE
                else:
                    delegate.write_data(s[anchor:end])

            elif token_type == _attributeName or token_type == _attributeName_:
                if tag.attrs is None:
                    tag.attrs = {}
                if attr is not None:  # complete previous attribute
                    tag.attrs[attr[0]] = attr[1]
                name = s[anchor:end]
                if token_type == _attributeName_:
                    name = name.lower()
                # first-write-wins; JS `in` sees Object.prototype keys
                if name in tag.attrs or name in JS_PROTO_KEYS:
                    attr = None
                else:
                    attr = [name, ""]
                token_state = S_BEFORE_ASSIGN

            elif token_type == _unquoted:
                if attr is not None:
                    attr[1] += s[anchor:end]
                token_state = S_VALUE_UNQUOTED

            elif token_type == _squoted or token_type == _quoted:
                if attr is not None:
                    attr[1] += s[anchor:end]

            elif token_type == _tagEnd:
                if attr is not None:
                    tag.attrs[attr[0]] = attr[1]
                if end >= 2 and s[end - 2] == "/":
                    if isinstance(tag, Element):
                        tag.selfclose = True
                self._sync(pos, anchor, end, token_state, tag, attr)
                is_element = isinstance(tag, Element)
                pc = self._emit_tag(tag)
                self.parser_context = pc
                token_state = (
                    _CONTENT_MAP.get(self.last_start_tag, S_MAIN)
                    if is_element and not (pc & _FOREIGN)
                    else S_MAIN
                )
                tag = attr = None

            elif token_type == _mDeclStart:
                if _lowercase_equiv(s[anchor + 2 : anchor + 9], "doctype"):
                    tag = Doctype()
                    self.emit = "doctype"
                    token_state = S_IN_BOGUS_COMMENT
                else:
                    tag = Comment()
                    tag.data.append(s[anchor + 2 : end])
                    self.emit = "comment"
                    token_state = S_BEFORE_COMMENT_DATA

            elif token_type == _commentStart:
                tag = Comment()
                self.emit = "comment"
                token_state = S_BEFORE_COMMENT_DATA

            elif token_type == _bogusStart:
                tag = Comment()
                self.emit = "comment"
                token_state = S_IN_BOGUS_COMMENT

            elif token_type == _bogusData:
                tag.data.append(s[anchor:end])
                token_state = S_IN_BOGUS_COMMENT

            elif token_type == _commentData:
                tag.data.append(s[anchor:end])
                token_state = S_IN_COMMENT_DATA

            elif token_type == _commentEnd or token_type == _bogusEnd:
                self._sync(pos, anchor, end, token_state, tag, attr)
                self.parser_context = self._emit_tag(tag)
                tag = attr = None
                token_state = S_MAIN

            elif token_type == _nulls:
                if (self.parser_context & _FOREIGN) or token_state != S_MAIN:
                    replaced = "�" * (end - anchor)
                    if tag is not None and isinstance(tag, Comment):
                        tag.data.append(replaced)
                    else:
                        delegate.write_data(replaced)

            elif token_type == _charRefHex or token_type == _charRefDecimal:
                if token_type == _charRefHex:
                    base, start = 16, anchor + 3
                else:
                    base, start = 10, anchor + 2
                decoded = _parse_numeric(s[start:end], base)
                if tag is None:
                    delegate.write_data(decoded)
                elif attr is not None:
                    attr[1] += decoded
                if token_state == S_BEFORE_VALUE:
                    token_state = S_VALUE_UNQUOTED

            elif token_type == _charRefNamed or token_type == _charRefLegacy:
                ref = s[anchor + 1 : end]
                decoded = _NAMED_REFS.get(ref) or s[anchor:end]
                if tag is None:
                    delegate.write_data(decoded)
                elif attr is not None:
                    attr[1] += decoded
                if token_state == S_BEFORE_VALUE:
                    token_state = S_VALUE_UNQUOTED

            elif token_type == _commentDataNL:
                tag.data.append("\n")
                self.lastnl = pos
                self.line += 1
                token_state = S_IN_COMMENT_DATA

            elif token_type == _tagSpaceNL:
                self.lastnl = pos
                self.line += 1
                # don't change entry state

            elif token_type == _attrSpaceNL:
                if attr is not None:
                    tag.attrs[attr[0]] = attr[1]
                    attr = None
                self.lastnl = pos
                self.line += 1
                token_state = S_BEFORE_ATTRIBUTE

            elif token_type == _tagSpace:
                pass  # don't change state

            elif token_type == _attributeAssign:
                token_state = S_BEFORE_VALUE
            elif token_type == _valueStartQuot:
                token_state = S_VALUE_QUOTED
            elif token_type == _valueStartApos:
                token_state = S_VALUE_APOSED

            elif token_type == _valueEnd or token_type == _attrSpace:
                if attr is not None:
                    tag.attrs[attr[0]] = attr[1]
                    attr = None
                token_state = S_BEFORE_ATTRIBUTE

            elif token_type == _errorToken:
                raise LexerError(
                    f"Lexer error at line {self.line}:{pos - self.lastnl}"
                )

            else:
                raise LexerError(f"unknown token {token_type}")

            anchor = pos = end

        self.pos = pos
        self.anchor = anchor
        self.end = end
        self.token_state = token_state
        self.tag = tag
        self.attr = attr

    def _sync(self, pos, anchor, end, token_state, tag, attr):
        # keep attribute state visible across delegate re-entrancy
        self.pos = pos
        self.anchor = anchor
        self.end = end
        self.token_state = token_state
        self.tag = tag
        self.attr = attr

    def _emit_tag(self, tag):
        d = self.delegate
        kind = self.emit
        if kind == "tag":
            return d.write_tag(tag)
        if kind == "end_tag":
            return d.write_end_tag(tag)
        if kind == "comment":
            return d.write_comment(tag)
        return d.write_doctype(tag)
