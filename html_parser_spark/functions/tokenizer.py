"""Quirk-exact WHATWG-style HTML tokenizer (pure Python, no Spark imports).

Behavioral port of the reference engine's 7-register tokenizer automaton
(reference: src/tokenizer/mod.rs:17-3819, src/tokenizer/state.rs) — NOT a code
translation: the implementation is a single flat ``while`` loop over integer
state constants with a regex fast path for plain-text runs, designed to run
inside Arrow-batched pandas UDFs.  Golden equality is defined by differential
testing against the compiled reference binary (SURVEY.md §5).

Replicated quirks (each pinned by tests/fixtures/probe_cases.jsonl):

* end tags are emitted only when they match the top of an ``open_tags`` stack,
  otherwise silently dropped; void/self-closing elements bypass the stack
  (mod.rs:3756-3779) — e.g. ``<body><br></body>`` drops ``</body>``.
* ``<!doctype`` with a lowercase ``d`` becomes a bogus comment: the markup
  declaration dispatch matches ``'D'`` only (mod.rs:1109).
* tag-open alpha test is Unicode ``is_alphabetic`` (mod.rs:231), so ``<éx>``
  opens a tag; end-tag-open is ASCII-only (mod.rs:259).
* duplicate attributes are kept (mod.rs:374-378 unimplemented dedup).
* NUL in the data state is emitted as-is (mod.rs:196).
* named references consume alphabetic chars and ``;`` only, so digit-bearing
  entities (``&frac12;``) never decode (mod.rs:752-783); the no-semicolon
  prefix fallback tries byte-prefixes of length min(7,len)..4 only, so 3-byte
  entities like ``&gt`` never prefix-match (mod.rs:839-857); the in-attribute
  historical rule re-flushes raw when the terminator is ``=``/alphanumeric
  (mod.rs:796-824).
* numeric-reference accumulators wrap at u32 like a Rust release build
  (mod.rs:992-1032); the C1 remap table is incomplete (entities.py).
* ``&#x`` at EOF is swallowed: the hex-start EOF arm reconsumes without
  flushing the temp buffer (mod.rs:958-960).
* three reference states lack EOF arms and hang forever on inputs ending in
  ``<!``, ``<!--x-`` or ``<!DOCTYPE name␣`` (mod.rs:1098-1126, 1398-1416,
  1565-1612).  This port *terminates* on them and reports
  ``parse_status='hang_in_reference'`` (documented divergence; excluded from
  the equality denominator — the reference never produces output for them).
* the named-reference byte-prefix slice can split a UTF-8 char boundary, which
  panics the reference process (Rust ``&buffer[..max]``).  This port reports
  ``parse_status='panic_in_reference'`` and recovers by flushing raw.

Token model (mirrors src/tokenizer/token.rs:183-190, with Char runs coalesced
losslessly into one ``chars`` entry per run — the serialization format used by
the golden fixtures):

    ("chars", data, src_start, src_end)
    ("start", name, attrs, self_closing)      attrs: list[[name, value]]
    ("end",   name, attrs, self_closing)
    ("comment", data)
    ("doctype", name, public_id, system_id, force_quirks)
    ("eof",)

``src_start``/``src_end`` are char offsets into the raw input covering the
source region a text run came from (entity references attribute their decoded
characters to the reference's source span) — consumed by extract.py for spans.
"""

from __future__ import annotations

import re
import unicodedata

from .entities import (
    MAX_POSSIBLE,
    MAX_WITHOUT_SEMICOLON,
    MIN_POSSIBLE,
    ENTITIES,
    is_numeric_control,
    is_numeric_noncharacter,
    is_numeric_surrogate,
    is_numeric_whitespace,
    replace_control,
)

# ---------------------------------------------------------------------------
# states (subset ordering irrelevant; ints for dispatch speed)
# reference: src/tokenizer/state.rs:2-323
DATA = 0
TAG_OPEN = 1
TAG_NAME = 2
BEFORE_ATTR_NAME = 3
ATTR_NAME = 4
AFTER_ATTR_NAME = 5
BEFORE_ATTR_VALUE = 6
ATTR_VALUE_DQ = 7
ATTR_VALUE_SQ = 8
ATTR_VALUE_UQ = 9
AFTER_ATTR_VALUE_Q = 10
END_TAG_OPEN = 11
SELF_CLOSING = 12
CHAR_REF = 13
NAMED_CHAR_REF = 14
NUMERIC_CHAR_REF = 15
HEX_CHAR_REF_START = 16
DEC_CHAR_REF_START = 17
DEC_CHAR_REF = 18
HEX_CHAR_REF = 19
NUMERIC_CHAR_REF_END = 20
BOGUS_COMMENT = 21
AMBIGUOUS_AMPERSAND = 22
MARKUP_DECL_OPEN = 23
COMMENT_START = 24
COMMENT_START_DASH = 25
COMMENT = 26
COMMENT_LTS = 27
COMMENT_LTS_BANG = 28
COMMENT_LTS_BANG_DASH = 29
COMMENT_LTS_BANG_DASH_DASH = 30
COMMENT_END_DASH = 31
COMMENT_END = 32
COMMENT_END_BANG = 33
DOCTYPE = 34
BEFORE_DOCTYPE_NAME = 35
DOCTYPE_NAME = 36
AFTER_DOCTYPE_NAME = 37
AFTER_PUBLIC_KEYWORD = 38
BEFORE_PUBLIC_ID = 39
PUBLIC_ID_DQ = 40
PUBLIC_ID_SQ = 41
AFTER_PUBLIC_ID = 42
BETWEEN_PUB_SYS = 43
AFTER_SYSTEM_KEYWORD = 44
BEFORE_SYSTEM_ID = 45
SYSTEM_ID_DQ = 46
SYSTEM_ID_SQ = 47
AFTER_SYSTEM_ID = 48
BOGUS_DOCTYPE = 49
CDATA_SECTION = 50
CDATA_BRACKET = 51
CDATA_END = 52

# RCDATA / RAWTEXT / script-data / PLAINTEXT families (reference
# state.rs:2-323; unreachable from Data in the reference — no code path
# performs the tree-builder state feedback, SURVEY.md §2.4 — but the
# handlers exist and are replicated here behind an optional
# ``initial_state`` entry point, completing the 80-state automaton)
RCDATA = 53
RCDATA_LTS = 54
RCDATA_END_TAG_OPEN = 55
RCDATA_END_TAG_NAME = 56
RAWTEXT = 57
RAWTEXT_LTS = 58
RAWTEXT_END_TAG_OPEN = 59
RAWTEXT_END_TAG_NAME = 60
SCRIPT_DATA = 61
SCRIPT_LTS = 62
SCRIPT_END_TAG_OPEN = 63
SCRIPT_END_TAG_NAME = 64
SCRIPT_ESCAPE_START = 65
SCRIPT_ESCAPE_START_DASH = 66
SCRIPT_ESCAPED = 67
SCRIPT_ESCAPED_DASH = 68
SCRIPT_ESCAPED_DASH_DASH = 69
SCRIPT_ESCAPED_LTS = 70
SCRIPT_ESCAPED_END_TAG_OPEN = 71
SCRIPT_ESCAPED_END_TAG_NAME = 72
SCRIPT_DOUBLE_ESCAPE_START = 73
SCRIPT_DOUBLE_ESCAPED = 74
SCRIPT_DOUBLE_ESCAPED_DASH = 75
SCRIPT_DOUBLE_ESCAPED_DASH_DASH = 76
SCRIPT_DOUBLE_ESCAPED_LTS = 77
SCRIPT_DOUBLE_ESCAPE_END = 78
PLAINTEXT = 79

# end-tag-open/name family dispatch (shared handler bodies)
_ETO_FAMILY = {
    RCDATA_END_TAG_OPEN: (RCDATA_END_TAG_NAME, RCDATA),
    RAWTEXT_END_TAG_OPEN: (RAWTEXT_END_TAG_NAME, RAWTEXT),
    SCRIPT_END_TAG_OPEN: (SCRIPT_END_TAG_NAME, SCRIPT_DATA),
    SCRIPT_ESCAPED_END_TAG_OPEN: (SCRIPT_ESCAPED_END_TAG_NAME, SCRIPT_ESCAPED),
}
_ETN_FAMILY = {
    RCDATA_END_TAG_NAME: RCDATA,
    RAWTEXT_END_TAG_NAME: RAWTEXT,
    SCRIPT_END_TAG_NAME: SCRIPT_DATA,
    SCRIPT_ESCAPED_END_TAG_NAME: SCRIPT_ESCAPED,
}
# (match_state, else_state) per double-escape transition state
_DBL_ESCAPE = {
    SCRIPT_DOUBLE_ESCAPE_START: (SCRIPT_DOUBLE_ESCAPED, SCRIPT_ESCAPED),
    SCRIPT_DOUBLE_ESCAPE_END: (SCRIPT_ESCAPED, SCRIPT_DOUBLE_ESCAPED),
}
_RAWTEXTISH = {RAWTEXT: RAWTEXT_LTS, SCRIPT_DATA: SCRIPT_LTS}
_RCDATA_BREAK = re.compile(r"[&<\x00]")
_RAWTEXT_BREAK = re.compile(r"[<\x00]")
_ESCAPED_BREAK = re.compile(r"[<\x00\-]")
_NUL_BREAK = re.compile(r"\x00")
_ASCII_LOWER = frozenset("abcdefghijklmnopqrstuvwxyz")

_ATTR_VALUE_STATES = (ATTR_VALUE_DQ, ATTR_VALUE_SQ, ATTR_VALUE_UQ)

_WS = "\t\n\x0c "  # tab, LF, FF, space — the tokenizer's whitespace class

_DATA_BREAK = re.compile(r"[&<]")
# bulk fast-path break sets for the other hot states: each matches exactly
# the characters handled by a non-default arm (state switch / case fold /
# NUL replacement) of that state's per-char handler; every char before the
# break lands in the default "append verbatim" arm, so bulk-appending the
# run is semantics-preserving (differential-tested vs the reference binary)
_TAGNAME_BREAK = re.compile(r"[\t\n\x0c />\x00A-Z]")
_ATTRNAME_BREAK = re.compile(r"[\t\n\x0c />=\x00A-Z]")
_ATTRVAL_DQ_BREAK = re.compile(r'["&\x00]')
_ATTRVAL_SQ_BREAK = re.compile(r"['&\x00]")
_ATTRVAL_UQ_BREAK = re.compile(r"[\t\n\x0c &>\x00]")
_COMMENT_BREAK = re.compile(r"[<\-\x00]")
_BOGUS_BREAK = re.compile(r"[>\x00]")

# ---------------------------------------------------------------------------
# whole-tag fast path: one C-level regex match per *common-case* tag.
#
# The grammar below is a strict subset of what the automaton accepts; any
# input needing case folding, entity decoding, NUL replacement, CR-in-tag,
# reconsume quirks, or parse-error arms falls outside it and takes the
# per-char automaton path.  Inside the subset the automaton's behavior is
# provably "append chars verbatim, then emit via emit_current_tag", so
# constructing the token directly is semantics-preserving (and the
# differential harness checks this against the reference binary).
#
# Notes mirroring the automaton (mod.rs:286-685):
# - whitespace is exactly [\t\n\x0c ] (\r/\v are ordinary chars → excluded
#   from the subset entirely so they fall back);
# - tag names: ASCII alpha (TAG_NAME folds A-Z with +0x20 ≡ str.lower on
#   the matched ASCII subset);
# - attr names: lowercase start, no '=' / uppercase (folding) / NUL;
# - values: NUL always falls back; & inside a value is decoded by
#   _decode_attr_value, a standalone replica of the CHAR_REF family with
#   return_state in _ATTR_VALUE_STATES (differentially tested slow-vs-fast
#   and vs the reference binary); unquoted may not start with "/'/=
#   (before-attr-value dispatch) and breaks on [\t\n\x0c &>\x00], where
#   the & continues the same value via the char-ref path — so the source
#   span of an unquoted value is the maximal [^\t\n\x0c >\x00] run;
# - '/' is self-closing ONLY when immediately followed by '>';
# - end tags with attributes are inside the subset (the reference keeps
#   them on the token).
_VAL = r"(?:\"[^\"\x00]*\"|'[^'\x00]*'|[^\t\n\x0c \"'=>\x00][^\t\n\x0c >\x00]*)"
_FAST_ATTR = re.compile(
    r"([a-z][a-z0-9_:.-]*)(?:[\t\n\x0c ]*=[\t\n\x0c ]*(" + _VAL + r"))?"
)
_FAST_TAG = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:[\t\n\x0c ]+[a-z][a-z0-9_:.-]*"
    r"(?:[\t\n\x0c ]*=[\t\n\x0c ]*" + _VAL + r")?)*)"
    r"[\t\n\x0c ]*(/?)>"
)
# fused data-run + tag scan: ONE regex call per (text run, tag) pair
# instead of _DATA_BREAK.search + _FAST_TAG.match.  Group 1 is the DATA
# run ([^&<]* — same break set as _DATA_BREAK; NUL passes through DATA
# verbatim), groups 2-5 are _FAST_TAG's groups shifted by one.  Sound
# because the run class excludes '<' while the tag alternative requires
# it, so backtracking can neither shorten the run nor blow up; and a
# fused failure implies _FAST_TAG cannot match at the first break either
# (if the first break were '<' opening a subset tag, the fused pattern
# would have matched), so the fallback no longer retries the tag regex.
# Measured 9-17% single-thread tokenize gain on the fixture corpus
# (in-process ABAB, BENCH.md round 4).
_DATA_TAG = re.compile(r"([^&<]*)" + _FAST_TAG.pattern)
# simple comments: no '-'/'<'/NUL in the body ⇒ the automaton appends the
# body verbatim and the trailing --> closes it (abrupt ``<!-->`` forms
# don't match and fall back)
# content must not START with '>' — "<!-->" is an abrupt close (empty
# comment + reprocess) per comment_start, which the bulk match would
# otherwise swallow into the comment (found by round-2 fuzz:
# "<!-->x-->" → ref comment "" + chars "x-->", fast path said ">x")
_FAST_COMMENT = re.compile(r"<!--([^-<\x00>][^-<\x00]*|)-->")

# doctype fast path: only uppercase 'D' dispatches the keyword scan
# (consume_doctype mod.rs:3489-3518), remaining keyword chars are
# case-insensitive.  Both "<!DOCTYPE name>" (whitespace optional: the
# DOCTYPE state's anything-else arm reconsumes into BEFORE_DOCTYPE_NAME)
# and the force-quirks "<!DOCTYPE>"/"<!DOCTYPE >" forms are in the subset;
# names are ASCII-alpha-led and folded like DOCTYPE_NAME's A-Z arm.
_FAST_DOCTYPE = re.compile(
    r"<!D[Oo][Cc][Tt][Yy][Pp][Ee][\t\n\x0c ]*"
    r"(?:([a-zA-Z][a-zA-Z0-9]*)[\t\n\x0c ]*)?>"
)
# bogus-comment fast paths (mod.rs:688-715): "<!" followed by anything
# that is not a comment ('-'), doctype ('D'), or CDATA ('[') dispatch
# collects verbatim to '>' (the empty alternative is "<!>" → comment "");
# "<?" is tag-open's '?' arm — the comment INCLUDES the '?'.  NUL bodies
# fall back (the automaton substitutes U+FFFD there).
_FAST_BOGUS = re.compile(r"<!([^-D\[>\x00][^>\x00]*|)>")
_FAST_PI = re.compile(r"<(\?[^>\x00]*)>")
# CDATA fast path (consume_cdata mod.rs:3520-3552 — case-sensitive, no
# adjusted-current-node check): a body with no ']'/NUL is emitted raw and
# the closing "]]>" emits nothing; bodies containing ']' fall back to the
# CDATA_BRACKET/CDATA_END automaton arms.
_FAST_CDATA = re.compile(r"<!\[CDATA\[([^\]\x00]*)\]\]>")
# bulk scanner for NAMED_CHAR_REF's alpha run — ASCII subset of Rust
# char::is_alphabetic; a run ending at a non-ASCII char needs the per-char
# check to decide whether the run actually continues (unicode alphabetic)
_ENT_ALPHA_RUN = re.compile(r"[A-Za-z]*")
# whole-reference fast shapes for data_char_ref: the common "&name;" with
# an ASCII-alpha run short enough that the MAX_POSSIBLE(=33) loop cap can
# never fire ({1,32} + ';' fails on any 33+ run and falls to the slow
# scan), and bulk digit runs for numeric refs (int(run, base) & 0xFFFFFFFF
# equals the reference's per-char u32 wrap by modular induction:
# ((a mod m)*b + d) mod m == (a*b + d) mod m)
_FAST_NAMED_REF = re.compile(r"[A-Za-z]{1,32};")
_DEC_RUN = re.compile(r"[0-9]+")
_HEX_RUN = re.compile(r"[0-9a-fA-F]+")

# memo for the whole-tag fast path, keyed on the EXACT matched source
# substring.  Web-scale corpora repeat tag strings massively (the fixture
# corpus: 105k fast-path tag occurrences, 105 distinct strings), so after
# the first occurrence a tag costs one dict probe instead of
# finditer + case-fold + entity-decode.  Values are immutable
# (is_end, name, attrs-as-tuple-of-pairs, self_closing); each hit
# re-materializes a fresh list-of-lists so token consumers that copy or
# iterate attrs see exactly the objects the parse path would build.
# Bounded: cleared wholesale past 64k distinct tags (adversarial inputs
# with unbounded distinct attribute values must not grow a per-executor
# dict forever; a clear costs one re-parse per distinct tag).
_TAG_MEMO: dict = {}
_TAG_MEMO_MAX = 1 << 16
# same idea for quoted/unquoted attr values containing '&' reached on a
# memo MISS (distinct tags sharing one hot value, e.g. a repeated URL)
_ATTRVAL_MEMO: dict = {}
# named-char-ref outcome memo: the resolution of a scanned "&name[;]"
# string (direct entity hit, byte-domain prefix fallback + raw tail, or
# the all-raw AMBIGUOUS_AMPERSAND case) depends only on the name string,
# so the emitted text, the PANIC flag from the fallback's utf-8 prefix
# probes, and the ambiguous flag are computed once per distinct name.
# Corpora reuse a handful of entities massively (fixture corpus: ~236k
# named refs, 22 distinct).  Values: (emit_str, panic, ambiguous).
_ENT_OUTCOME_MEMO: dict = {}

_ASCII_ALPHA = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)
_ASCII_UPPER = frozenset("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
_ASCII_DIGIT = frozenset("0123456789")
_ASCII_HEX = frozenset("0123456789abcdefABCDEF")

REPLACEMENT = "�"

# parse_status values
OK = "ok"
HANG = "hang_in_reference"
PANIC = "panic_in_reference"


def _is_alphabetic(c: str) -> bool:
    """Rust char::is_alphabetic ≈ Unicode Alphabetic.

    Python ``str.isalpha`` covers L*; add Nl to close most of the gap
    (Other_Alphabetic combining marks are not covered — documented
    divergence, absent from the fixture grammar).
    """
    return c.isalpha() or unicodedata.category(c) == "Nl"


def _is_alphanumeric(c: str) -> bool:
    """Rust char::is_alphanumeric ≈ Alphabetic ∪ N*."""
    return c.isalnum() or unicodedata.category(c) == "Nl"


def _numeric_ref_char(code: int) -> str:
    """NUMERIC_CHAR_REF_END's code→char mapping (mod.rs:1048-1095):
    0 / >0x10FFFF / surrogate / noncharacter → U+FFFD; CR and non-
    whitespace controls remapped via the reference's incomplete C1
    table.  The guard clauses are mutually exclusive with the remap
    (U+FFFD is none of CR/control), so elif ≡ the reference's
    sequential ifs."""
    if (
        code == 0x00
        or code > 0x10FFFF
        or is_numeric_surrogate(code)
        or is_numeric_noncharacter(code)
    ):
        code = 0xFFFD
    elif code == 0x0D or (
        is_numeric_control(code) and not is_numeric_whitespace(code)
    ):
        code = replace_control(code)
    try:
        return chr(code)
    except ValueError:
        return REPLACEMENT


def _decode_attr_value(s: str) -> str:
    """Char-reference decoding for one complete attribute value, exactly
    as the automaton behaves with return_state in _ATTR_VALUE_STATES
    (CHAR_REF family, mod.rs:718-1095).

    Called by the whole-tag fast path when a captured value contains '&'.
    Caller guarantees: no NUL, and no value-terminator char inside ``s``
    (the closing quote for quoted values; [\\t\\n\\x0c >] for unquoted) —
    so end-of-``s`` behaves as "break and reprocess the terminator",
    modeled here as a virtual '\"' (non-alpha / non-digit / non-';' /
    non-'=' in every branch, which is all the automaton inspects).  EOF
    quirks cannot trigger: in the matched subset the tag's '>' always
    exists beyond the value.

    Reference quirks replicated (pinned slow-vs-fast by
    tests/test_tokenizer.py::test_attr_value_charref_fast_matches_slow
    and against the reference binary by the differential suite):
      - '&' followed by neither '#' nor alphanumeric is DROPPED
        (CHAR_REF's anything-else arm reconsumes without flushing
        temp_buf, mod.rs:718-749);
      - named references consume Unicode-ALPHABETIC chars only — digits
        break the scan, so e.g. "&frac12;" never matches;
      - the historical rule: a matched name followed by '=' or an
        alphanumeric is flushed raw (mod.rs:822-824);
      - NAMED_CHAR_REF's MAX_POSSIBLE loop cap: on exhaustion the last
        consumed char stays in the raw flush AND is reprocessed;
      - numeric references: u32 wraparound accumulation and the
        _numeric_ref_char mapping; "&#"/"&#x" with no digits flush raw
        (keeping the x/X case).
    """
    out: list = []
    push = out.append
    i = 0
    L = len(s)
    while True:
        j = s.find("&", i)
        if j < 0:
            push(s[i:])
            break
        if j > i:
            push(s[i:j])
        i = j + 1
        c = s[i] if i < L else '"'
        if c == "#":
            i += 1
            c = s[i] if i < L else '"'
            if c == "x" or c == "X":
                x = c
                i += 1
                c = s[i] if i < L else '"'
                if c in _ASCII_HEX:
                    code = 0
                    while i < L:
                        c = s[i]
                        if c in _ASCII_DIGIT:
                            code = (code * 16 + (ord(c) - 0x30)) & 0xFFFFFFFF
                        elif c in _ASCII_HEX:
                            code = (
                                code * 16
                                + (ord(c) - (0x37 if "A" <= c <= "F" else 0x57))
                            ) & 0xFFFFFFFF
                        elif c == ";":
                            i += 1
                            break
                        else:
                            break
                        i += 1
                    push(_numeric_ref_char(code))
                else:
                    # HEX_CHAR_REF_START anything-else: flush raw, reconsume
                    push("&#" + x)
            elif c in _ASCII_DIGIT:
                code = 0
                while i < L:
                    c = s[i]
                    if c in _ASCII_DIGIT:
                        code = (code * 10 + (ord(c) - 0x30)) & 0xFFFFFFFF
                    elif c == ";":
                        i += 1
                        break
                    else:
                        break
                    i += 1
                push(_numeric_ref_char(code))
            else:
                # DEC_CHAR_REF_START anything-else: flush raw, reconsume
                push("&#")
        elif (
            "a" <= c <= "z" or "A" <= c <= "Z" or "0" <= c <= "9"
        ) or _is_alphanumeric(c):
            # NAMED_CHAR_REF — bulk-scan the ASCII-alpha run; per-char
            # continuation only when it ends at a unicode-alphabetic char
            m = _ENT_ALPHA_RUN.match(s, i)
            e = m.end()
            if e - i >= MAX_POSSIBLE:
                # loop cap: exactly MAX_POSSIBLE chars consumed; the last
                # stays in the raw flush AND is reprocessed (reference
                # quirk).  A 34-char buffer is never in ENTITIES and its
                # breaking char is alphabetic (historical rule) — raw
                # either way.
                e = i + MAX_POSSIBLE
                push("&" + s[i:e])
                i = e - 1
                continue
            b = s[e] if e < L else None
            if b == ";":
                name = "&" + s[i:e] + ";"
                cur = ";"
                i = e + 1
            elif b is not None and _is_alphabetic(b):
                # rare: unicode-alphabetic continuation — per-char scan
                buf = ["&", s[i:e]]
                bpush = buf.append
                cur = '"'
                k = e - i
                i = e
                while k < MAX_POSSIBLE:
                    if i < L:
                        c = s[i]
                        i += 1
                    else:
                        cur = '"'  # virtual terminator, nothing consumed
                        break
                    if c == ";":
                        bpush(c)
                        cur = c  # ';' is consumed either way
                        break
                    if _is_alphabetic(c):
                        bpush(c)
                    else:
                        cur = c
                        i -= 1  # reconsumed by the attr-value state
                        break
                    k += 1
                else:
                    # loop cap: kept in buf AND reprocessed
                    cur = c
                    i -= 1
                name = "".join(buf)
            else:
                name = "&" + s[i:e]
                cur = b if b is not None else '"'
                i = e
            entity = ENTITIES.get(name)
            if entity is not None and cur != "=" and not _is_alphanumeric(cur):
                push(entity)
            else:
                # not found, or the historical '='/alnum rule: flush raw
                push(name)
        # anything else (incl. end-of-value): the '&' is DROPPED —
        # CHAR_REF reconsumes without flushing temp_buf
    return "".join(out)


def tokenize(text: str, initial_state: int = DATA):
    """Run the automaton over ``text``; return
    ``(tokens, parse_status, err_count)``.

    ``initial_state`` exposes the RCDATA/RAWTEXT/script-data/PLAINTEXT
    families (reference state.rs:2-323): in the reference they are
    unreachable from Data — the tree-builder feedback that would select
    them is unimplemented (SURVEY.md §2.4) — so the default entry point
    reproduces that topology exactly, while a caller tokenizing e.g. a
    raw <script> body can opt in.

    ``err_count`` counts end tags silently dropped by the open-tags stack
    filter (the reference's signature quirk, mod.rs:3756-3779) — the only
    parse-error signal the reference's output shape exposes.

    Always terminates (see module docstring for the divergence ledger).
    """
    n = len(text)
    tokens: list = []
    out = tokens.append

    # pending coalesced character run + its source attribution
    run: list = []
    run_push = run.append
    run_first = -1
    run_last_end = -1

    def flush_run():
        nonlocal run, run_first, run_last_end, run_push
        if run:
            out(("chars", "".join(run), run_first, run_last_end))
            run = []
            run_push = run.append
            run_first = -1

    # 7-register machine (reference: src/tokenizer/mod.rs:17-37)
    state = initial_state
    return_state = DATA
    pos = 0  # index of next char to consume
    cur: str | None = None  # current_character
    cur_idx = -1  # source index of cur (n at EOF)
    recon = False  # reconsume flag
    temp_buf: str | None = None  # temporary_buffer (None ≡ Rust None)
    char_ref_code = 0
    open_tags: list[str] = []

    # current token registers (exactly one kind active at a time)
    tok_kind = 0  # 0 none, 1 tag, 2 comment, 3 doctype
    tag_name = ""
    tag_attrs: list = []
    tag_self_closing = False
    tag_is_end = False
    comment_data = ""
    dt_name = ""
    dt_public: str | None = None
    dt_system: str | None = None
    dt_quirks = False

    status = OK
    err_count = 0  # end tags dropped by the stack filter
    lt_idx = -1  # source index of the pending '<' in the *-less-than-sign states
    amp_src = -1  # source index of the '&' opening the current char ref

    def emit_chars(s: str, src_start: int, src_end: int):
        nonlocal run_first, run_last_end
        if not run:
            run_first = src_start
        run_push(s)
        run_last_end = src_end

    def emit_current_tag():
        # reference: emit_current_tag_token mod.rs:3756-3779 — THE stack quirk
        nonlocal tok_kind, err_count
        if tok_kind != 1:
            tok_kind = 0
            return
        tok_kind = 0
        if not tag_self_closing:
            if tag_is_end:
                if open_tags and open_tags[-1] == tag_name:
                    open_tags.pop()
                    flush_run()
                    out(("end", tag_name, tag_attrs, tag_self_closing))
                else:
                    err_count += 1  # silently dropped by the reference
            else:
                open_tags.append(tag_name)
                flush_run()
                out(("start", tag_name, tag_attrs, tag_self_closing))
        else:
            flush_run()
            out(
                (
                    "end" if tag_is_end else "start",
                    tag_name,
                    tag_attrs,
                    tag_self_closing,
                )
            )

    def emit_doctype():
        # reference: emit_current_token mod.rs:3738-3743 — generic take-and-
        # push: emits WHATEVER the current token is, bypassing the open-tags
        # stack filter.  Used by every DOCTYPE emission site.
        nonlocal tok_kind
        if tok_kind == 3:
            flush_run()
            out(("doctype", dt_name, dt_public, dt_system, dt_quirks))
        elif tok_kind == 2:
            flush_run()
            out(("comment", comment_data))
        elif tok_kind == 1:
            flush_run()
            out(
                (
                    "end" if tag_is_end else "start",
                    tag_name,
                    tag_attrs,
                    tag_self_closing,
                )
            )
        tok_kind = 0

    def emit_comment():
        # reference: emit_current_comment_token mod.rs:3745-3754 — only if
        # the current token is a comment (otherwise silently dropped)
        nonlocal tok_kind
        if tok_kind == 2:
            flush_run()
            out(("comment", comment_data))
        tok_kind = 0

    done = False

    def emit_eof():
        nonlocal done
        flush_run()
        out(("eof",))
        done = True

    def data_char_ref(j: int) -> int:
        """Inline equivalent of '&' in DATA: CHAR_REF → NAMED/NUMERIC →
        ... → back to DATA, with return_state == DATA (mod.rs:718-1095).
        ``j`` is the '&' source index; returns the resume position (the
        automaton's effective next-consume index after the reference,
        accounting for reconsume).  Exactly mirrors the slow-path states —
        including span endpoints (named refs include the breaking char in
        the span end; numeric refs exclude it), the dropped lone '&', the
        byte-domain prefix fallback with its PANIC flag, the MAX_POSSIBLE
        loop-cap reprocess, AMBIGUOUS_AMPERSAND, and the '&#x'-at-EOF
        swallow.  Pinned slow-vs-fast by test_tokenizer.py and vs the
        reference binary by the differential suite."""
        nonlocal status
        i = j + 1
        c = text[i] if i < n else None
        if c == "#":
            i += 1
            c = text[i] if i < n else None
            if c == "x" or c == "X":
                x = c
                i += 1
                c = text[i] if i < n else None
                if c is not None and c in _ASCII_HEX:
                    e = _HEX_RUN.match(text, i).end()
                    code = int(text[i:e], 16) & 0xFFFFFFFF
                    # NUMERIC_CHAR_REF_END span: a consumed ';' is inside
                    # (cur_idx+1), a reconsumed breaking char is not
                    # (cur_idx) — both equal the resume position because
                    # we advance past ';' but not past a breaking char
                    if e < n and text[e] == ";":
                        e += 1
                    emit_chars(_numeric_ref_char(code), j, e)
                    return e
                if c is None:
                    # HEX_CHAR_REF_START EOF quirk: reconsume WITHOUT
                    # flushing — "&#x" at EOF is swallowed
                    return n
                # anything else: flush "&#x" raw (span ends at the
                # breaking char, which is then reprocessed)
                emit_chars("&#" + x, j, i)
                return i
            if c is not None and c in _ASCII_DIGIT:
                e = _DEC_RUN.match(text, i).end()
                code = int(text[i:e], 10) & 0xFFFFFFFF
                if e < n and text[e] == ";":
                    e += 1
                emit_chars(_numeric_ref_char(code), j, e)
                return e
            # DEC_CHAR_REF_START EOF/anything-else: flush "&#" raw
            emit_chars("&#", j, i if i < n else n)
            return i if i < n else n
        if c is not None and (
            ("a" <= c <= "z" or "A" <= c <= "Z" or "0" <= c <= "9")
            or _is_alphanumeric(c)
        ):
            # NAMED_CHAR_REF fast shape: a short ASCII-alpha run ending in
            # ';' — the b == ';' arm below with the loop cap provably
            # unreachable ({1,32} can't absorb a 33+ run)
            fm = _FAST_NAMED_REF.match(text, i)
            if fm is not None:
                name = "&" + fm.group(0)
                cur_c: str | None = ";"
                i = fm.end()
                m = None
            else:
                m = _ENT_ALPHA_RUN.match(text, i)
            # NAMED_CHAR_REF — bulk-scan the ASCII-alpha run; per-char
            # continuation only when it ends at a unicode-alphabetic char
            if m is None:
                pass
            elif (e := m.end()) - i >= MAX_POSSIBLE:
                # loop cap: last consumed char kept in buf AND reprocessed
                e = i + MAX_POSSIBLE
                name = "&" + text[i:e]
                cur_c: str | None = name[-1]
                i = e
            else:
                b = text[e] if e < n else None
                if b == ";":
                    name = "&" + text[i:e] + ";"
                    cur_c = ";"
                    i = e + 1
                elif b is not None and _is_alphabetic(b):
                    # rare: unicode-alphabetic continuation — per-char
                    buf = ["&", text[i:e]]
                    bpush = buf.append
                    cur_c = None
                    k = e - i
                    i = e
                    while k < MAX_POSSIBLE:
                        if i < n:
                            c = text[i]
                            i += 1
                        else:
                            cur_c = None
                            break
                        if c == ";":
                            bpush(c)
                            cur_c = c
                            break
                        if _is_alphabetic(c):
                            bpush(c)
                        else:
                            cur_c = c
                            break
                        k += 1
                    else:
                        cur_c = c  # loop cap: kept in buf AND reprocessed
                    name = "".join(buf)
                elif b is None:
                    name = "&" + text[i:e]
                    cur_c = None
                    i = e
                else:
                    name = "&" + text[i:e]
                    cur_c = b
                    i = e + 1
            # span end: cur_idx + 1 when a char broke the scan (even a
            # reconsumed one), cur_idx (= n) at EOF
            end = i if cur_c is not None else n
            # resume: ';' consumed; a breaking char is reprocessed
            resume = i if (cur_c == ";" or cur_c is None) else i - 1
            outcome = _ENT_OUTCOME_MEMO.get(name)
            if outcome is None:
                entity = ENTITIES.get(name)
                if entity is not None:
                    outcome = (entity, False, False)
                else:
                    # byte-domain prefix fallback (mod.rs:839-877).  The
                    # slow path emitted [matched?] + the raw tail chars
                    # one emit_chars call each, all with span (j, end) —
                    # they land in the same pending run, so one
                    # concatenated emission is output-identical.  The raw
                    # tail is name[mx:] with mx in the BYTE domain
                    # compared against CHAR indices — the reference's
                    # quirk, preserved verbatim.
                    panic = False
                    bbuf = name.encode("utf-8")
                    mx = MAX_WITHOUT_SEMICOLON + 1
                    if mx > len(bbuf):
                        mx = len(bbuf)
                    matched = None
                    while mx > MIN_POSSIBLE:
                        try:
                            prefix = bbuf[:mx].decode("utf-8")
                        except UnicodeDecodeError:
                            panic = True
                            prefix = None
                        if prefix is not None:
                            matched = ENTITIES.get(prefix)
                            if matched is not None:
                                break
                        mx -= 1
                    if mx != MIN_POSSIBLE:
                        # matched can be None here when the initial mx is
                        # already below MIN_POSSIBLE (very short names,
                        # e.g. "&a"): the slow path emitted nothing at all
                        # — an empty emit_str reproduces that via the
                        # emission guard below
                        outcome = (
                            (matched or "") + name[mx:],
                            panic,
                            False,
                        )
                    else:
                        outcome = (name, panic, True)
                if len(_ENT_OUTCOME_MEMO) >= _TAG_MEMO_MAX:
                    _ENT_OUTCOME_MEMO.clear()
                _ENT_OUTCOME_MEMO[name] = outcome
            emit_str, panic, ambiguous = outcome
            if panic:
                status = PANIC
            if emit_str:
                # guard: an empty outcome means the slow path emitted no
                # chars, so the pending run (incl. run_first) must stay
                # untouched
                emit_chars(emit_str, j, end)
            if not ambiguous:
                return resume
            # AMBIGUOUS_AMPERSAND: ASCII alpha only, each char its own span
            p = resume
            while p < n and text[p] in _ASCII_ALPHA:
                emit_chars(text[p], p, p + 1)
                p += 1
            return p
        # anything else (incl. EOF): the '&' is DROPPED — CHAR_REF
        # reconsumes without flushing temp_buf
        return i if c is not None else n

    while not done:

        if state == DATA:
            # fast path: bulk-copy the run up to the next '&'/'<'
            # (equivalent: every other char, incl. NUL, is emitted as-is —
            # mod.rs:179-206)
            if not recon and pos < n:
                # fused run+tag fast path: the overwhelmingly common DATA
                # shape is "text run then subset tag" — one C-level regex
                # call parses both (see _DATA_TAG soundness note)
                mdt = _DATA_TAG.match(text, pos)
                if mdt is not None:
                    tag_end = mdt.end()
                    j = mdt.end(1)
                    if j > pos:
                        if not run:
                            run_first = pos
                        run_push(text[pos:j])
                        run_last_end = j
                    src = text[j:tag_end]
                    hit = _TAG_MEMO.get(src)
                    if hit is not None:
                        end_slash, name, pairs, sc_slash = hit
                        # fresh attr lists per hit (CLAUDE.md invariant);
                        # the attr-less common case skips the listcomp call
                        attrs = [[a, b] for a, b in pairs] if pairs else []
                    else:
                        end_slash, name, g3, sc_slash = mdt.group(2, 3, 4, 5)
                        name = name.lower()  # TAG_NAME A-Z fold (+0x20)
                        end_slash = end_slash == "/"
                        sc_slash = sc_slash == "/"
                        attrs = []
                        if g3:
                            for am in _FAST_ATTR.finditer(g3):
                                v = am.group(2)
                                if v is None:
                                    v = ""
                                else:
                                    if v[0] == '"' or v[0] == "'":
                                        v = v[1:-1]
                                    if "&" in v:
                                        dv = _ATTRVAL_MEMO.get(v)
                                        if dv is None:
                                            if len(_ATTRVAL_MEMO) >= _TAG_MEMO_MAX:
                                                _ATTRVAL_MEMO.clear()
                                            dv = _decode_attr_value(v)
                                            _ATTRVAL_MEMO[v] = dv
                                        v = dv
                                attrs.append([am.group(1), v])
                        if len(_TAG_MEMO) >= _TAG_MEMO_MAX:
                            _TAG_MEMO.clear()
                        _TAG_MEMO[src] = (
                            end_slash,
                            name,
                            tuple((a[0], a[1]) for a in attrs),
                            sc_slash,
                        )
                    if sc_slash:
                        # self-closing bypasses the open-tags stack
                        if run:
                            out(("chars", "".join(run), run_first, run_last_end))
                            run.clear()
                            run_first = -1
                        out(("end" if end_slash else "start", name, attrs, True))
                    elif end_slash:
                        if open_tags and open_tags[-1] == name:
                            open_tags.pop()
                            if run:
                                out(("chars", "".join(run), run_first, run_last_end))
                                run.clear()
                                run_first = -1
                            out(("end", name, attrs, False))
                        else:
                            err_count += 1  # dropped by the stack filter
                    else:
                        open_tags.append(name)
                        if run:
                            out(("chars", "".join(run), run_first, run_last_end))
                            run.clear()
                            run_first = -1
                        out(("start", name, attrs, False))
                    pos = tag_end
                    cur = ">"
                    cur_idx = pos - 1
                    continue
                m = _DATA_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    if not run:
                        run_first = pos
                    run_push(text[pos:j])
                    run_last_end = j
                    pos = j
                # whole-construct fast paths, attempted straight at the
                # break char, dispatched on the char after '<' (subset
                # tags were already ruled out by the fused attempt above;
                # everything below is the inlined equivalent of consume →
                # TAG_OPEN → ... for each regex's subset)
                if j < n and text[j] == "<" and j + 1 < n:
                    c2 = text[j + 1]
                    mc = None
                    if c2 == "!":
                        mc = _FAST_COMMENT.match(text, j)
                    if mc is not None:
                        if run:
                            out(("chars", "".join(run), run_first, run_last_end))
                            run.clear()
                            run_first = -1
                        out(("comment", mc.group(1)))
                        pos = mc.end()
                        cur = ">"
                        cur_idx = pos - 1
                        continue
                    if c2 == "!":
                        md = _FAST_DOCTYPE.match(text, j)
                        if md is not None:
                            name = md.group(1)
                            if run:
                                out(("chars", "".join(run), run_first, run_last_end))
                                run.clear()
                                run_first = -1
                            if name is None:
                                # BEFORE_DOCTYPE_NAME '>' arm: force-quirks
                                out(("doctype", "", None, None, True))
                            else:
                                out(("doctype", name.lower(), None, None, False))
                            pos = md.end()
                            cur = ">"
                            cur_idx = pos - 1
                            continue
                        mcd = _FAST_CDATA.match(text, j)
                        if mcd is not None:
                            body = mcd.group(1)
                            if body:
                                # CDATA_SECTION emits the body raw into the
                                # pending run (source span = body span)
                                if not run:
                                    run_first = mcd.start(1)
                                run_push(body)
                                run_last_end = mcd.end(1)
                            pos = mcd.end()
                            cur = ">"
                            cur_idx = pos - 1
                            continue
                        mb = _FAST_BOGUS.match(text, j)
                        if mb is not None:
                            if run:
                                out(("chars", "".join(run), run_first, run_last_end))
                                run.clear()
                                run_first = -1
                            out(("comment", mb.group(1)))
                            pos = mb.end()
                            cur = ">"
                            cur_idx = pos - 1
                            continue
                    elif c2 == "?":
                        mp = _FAST_PI.match(text, j)
                        if mp is not None:
                            if run:
                                out(("chars", "".join(run), run_first, run_last_end))
                                run.clear()
                                run_first = -1
                            out(("comment", mp.group(1)))
                            pos = mp.end()
                            cur = ">"
                            cur_idx = pos - 1
                            continue
                    elif (
                        c2 != "&"
                        and c2 != "<"
                        and c2 != "/"
                        and not ("a" <= c2 <= "z" or "A" <= c2 <= "Z")
                        and not _is_alphabetic(c2)
                    ):
                        # TAG_OPEN anything-else: emit '<' as a character
                        # and reprocess c2 in DATA — c2 is an ordinary char
                        # here (not '&'/'<'), so the run just continues
                        if not run:
                            run_first = j
                        run_push("<")
                        run_last_end = j + 1
                        pos = j + 1
                        cur = "<"
                        continue
                elif j < n and text[j] == "&":  # inline char-ref, all cases
                    pos = data_char_ref(j)
                    cur = "&"
                    continue
            # consume
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == "&":
                return_state = DATA
                state = CHAR_REF
            elif c == "<":
                state = TAG_OPEN
            else:
                emit_chars(c, cur_idx, cur_idx + 1)
                cur = None  # emit_current_input_character takes it

        elif state == CHAR_REF:
            # mod.rs:718-749
            temp_buf = "&"
            amp_src = cur_idx
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = return_state
            elif c == "#":
                temp_buf += c
                state = NUMERIC_CHAR_REF
            elif _is_alphanumeric(c):
                recon = True
                state = NAMED_CHAR_REF
            else:
                recon = True
                state = return_state

        elif state == NAMED_CHAR_REF:
            # mod.rs:752-880 — ported with the same index arithmetic
            i = 0
            while i < MAX_POSSIBLE:
                if recon:
                    recon = False
                    c = cur
                elif pos < n:
                    c = cur = text[pos]
                    cur_idx = pos
                    pos += 1
                else:
                    c = cur = None
                    cur_idx = n
                if c is None:
                    break
                if c == ";":
                    temp_buf += c
                    break
                if _is_alphabetic(c):
                    temp_buf += c
                else:
                    break
                i += 1

            buffer = temp_buf if temp_buf is not None else ""
            in_attr = return_state in _ATTR_VALUE_STATES

            entity = ENTITIES.get(buffer)
            if entity is not None:
                if in_attr and cur != "=" and not (
                    cur is not None and _is_alphanumeric(cur)
                ):
                    for ch in entity:
                        if tok_kind == 1 and tag_attrs:
                            tag_attrs[-1][1] += ch
                    state = return_state
                elif not in_attr:
                    emit_chars(entity, amp_src, cur_idx + (0 if cur is None else 1))
                else:
                    # historical rule: flush raw (mod.rs:822-824)
                    if temp_buf is not None:
                        for ch in temp_buf:
                            if tok_kind == 1 and tag_attrs:
                                tag_attrs[-1][1] += ch
                        temp_buf = None
                if cur == ";":
                    state = return_state
                else:
                    recon = True
                    state = return_state
            else:
                if in_attr:
                    # flush_code_points... (mod.rs:831-837)
                    if temp_buf is not None:
                        for ch in temp_buf:
                            if tok_kind == 1 and tag_attrs:
                                tag_attrs[-1][1] += ch
                        temp_buf = None
                    if cur == ";":
                        state = return_state
                    else:
                        recon = True
                        state = return_state
                else:
                    # byte-domain prefix fallback (mod.rs:839-877); Rust
                    # slices &buffer[..max] by BYTES and panics on a char
                    # boundary violation — we flag and recover.
                    bbuf = buffer.encode("utf-8")
                    mx = MAX_WITHOUT_SEMICOLON + 1
                    if mx > len(bbuf):
                        mx = len(bbuf)
                    matched = None
                    while mx > MIN_POSSIBLE:
                        try:
                            prefix = bbuf[:mx].decode("utf-8")
                        except UnicodeDecodeError:
                            status = PANIC
                            prefix = None
                        if prefix is not None:
                            matched = ENTITIES.get(prefix)
                            if matched is not None:
                                emit_chars(
                                    matched,
                                    amp_src,
                                    cur_idx + (0 if cur is None else 1),
                                )
                                break
                        mx -= 1
                    # re-emit unmatched tail raw; Rust enumerates CHAR
                    # indices against the BYTE count mx (mod.rs:859-863) —
                    # safe here: any matched prefix is pure ASCII, so char
                    # and byte indices agree below mx (divergence is only
                    # possible through a decode failure, flagged above).
                    for index, ch in enumerate(buffer):
                        if index >= mx or mx == MIN_POSSIBLE:
                            emit_chars(ch, amp_src, cur_idx + (0 if cur is None else 1))
                    if mx != MIN_POSSIBLE:
                        if cur == ";":
                            state = return_state
                        else:
                            recon = True
                            state = return_state
                    else:
                        if cur == ";":
                            state = AMBIGUOUS_AMPERSAND
                        else:
                            recon = True
                            state = AMBIGUOUS_AMPERSAND

        elif state == TAG_OPEN:
            # mod.rs:209-250
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_chars("<", cur_idx - 1, cur_idx)
                emit_eof()
            elif c == "!":
                state = MARKUP_DECL_OPEN
            elif c == "/":
                state = END_TAG_OPEN
            elif c == "?":
                recon = True
                state = BOGUS_COMMENT
                tok_kind = 2
                comment_data = ""
            elif _is_alphabetic(c):
                tok_kind = 1
                tag_name = ""
                tag_attrs = []
                tag_self_closing = False
                tag_is_end = False
                recon = True
                state = TAG_NAME
            else:
                recon = True
                state = DATA
                emit_chars("<", cur_idx - 1, cur_idx)

        elif state == TAG_NAME:
            # mod.rs:286-330
            if not recon and pos < n:
                m = _TAGNAME_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    tag_name += text[pos:j]
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c in _WS:
                state = BEFORE_ATTR_NAME
            elif c == "/":
                state = SELF_CLOSING
            elif c == ">":
                state = DATA
                emit_current_tag()
            elif c in _ASCII_UPPER:
                tag_name += chr(ord(c) + 0x20)
            elif c == "\x00":
                tag_name += REPLACEMENT
            else:
                tag_name += c

        elif state == END_TAG_OPEN:
            # mod.rs:253-283 — ASCII alpha only (unlike tag open)
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_chars("</", cur_idx - 2, cur_idx)
                emit_eof()
            elif c in _ASCII_ALPHA:
                tok_kind = 1
                tag_name = ""
                tag_attrs = []
                tag_self_closing = False
                tag_is_end = True
                recon = True
                state = TAG_NAME
            elif c == ">":
                state = DATA
            else:
                tok_kind = 2
                comment_data = ""
                recon = True
                state = BOGUS_COMMENT

        elif state == BEFORE_ATTR_NAME:
            # mod.rs:333-371
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = AFTER_ATTR_NAME
            elif c in _WS:
                pass
            elif c == "/" or c == ">":
                recon = True
                state = AFTER_ATTR_NAME
            elif c == "=":
                if tok_kind == 1:
                    tag_attrs.append(["=", ""])
                state = ATTR_NAME
            else:
                if tok_kind == 1:
                    tag_attrs.append(["", ""])
                recon = True
                state = ATTR_NAME

        elif state == ATTR_NAME:
            # mod.rs:379-423 — duplicate attributes kept (dedup unimplemented)
            if not recon and pos < n:
                m = _ATTRNAME_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    if tok_kind == 1 and tag_attrs:
                        tag_attrs[-1][0] += text[pos:j]
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = AFTER_ATTR_NAME
            elif c in _WS or c == "/" or c == ">":
                recon = True
                state = AFTER_ATTR_NAME
            elif c == "=":
                state = BEFORE_ATTR_VALUE
            elif c in _ASCII_UPPER:
                if tok_kind == 1 and tag_attrs:
                    tag_attrs[-1][0] += chr(ord(c) + 0x20)
            elif c == "\x00":
                if tok_kind == 1 and tag_attrs:
                    tag_attrs[-1][0] += REPLACEMENT
            else:
                if tok_kind == 1 and tag_attrs:
                    tag_attrs[-1][0] += c

        elif state == AFTER_ATTR_NAME:
            # mod.rs:426-464
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c in _WS:
                pass
            elif c == "/":
                state = SELF_CLOSING
            elif c == "=":
                state = BEFORE_ATTR_VALUE
            elif c == ">":
                state = DATA
                emit_current_tag()
            else:
                if tok_kind == 1:
                    tag_attrs.append(["", ""])
                recon = True
                state = ATTR_NAME

        elif state == BEFORE_ATTR_VALUE:
            # mod.rs:467-504 — EOF falls through to unquoted (quirk)
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = ATTR_VALUE_UQ
            elif c in _WS:
                pass
            elif c == '"':
                state = ATTR_VALUE_DQ
            elif c == "'":
                state = ATTR_VALUE_SQ
            elif c == ">":
                state = DATA
                emit_current_tag()
            else:
                recon = True
                state = ATTR_VALUE_UQ

        elif state == ATTR_VALUE_DQ:
            # mod.rs:507-537
            if not recon and pos < n:
                m = _ATTRVAL_DQ_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    if tok_kind == 1 and tag_attrs:
                        tag_attrs[-1][1] += text[pos:j]
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == '"':
                state = AFTER_ATTR_VALUE_Q
            elif c == "&":
                return_state = ATTR_VALUE_DQ
                state = CHAR_REF
            elif c == "\x00":
                if tok_kind == 1 and tag_attrs:
                    tag_attrs[-1][1] += REPLACEMENT
            else:
                if tok_kind == 1 and tag_attrs:
                    tag_attrs[-1][1] += c

        elif state == ATTR_VALUE_SQ:
            # mod.rs:540-571
            if not recon and pos < n:
                m = _ATTRVAL_SQ_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    if tok_kind == 1 and tag_attrs:
                        tag_attrs[-1][1] += text[pos:j]
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == "'":
                state = AFTER_ATTR_VALUE_Q
            elif c == "&":
                return_state = ATTR_VALUE_SQ
                state = CHAR_REF
            elif c == "\x00":
                if tok_kind == 1 and tag_attrs:
                    tag_attrs[-1][1] += REPLACEMENT
            else:
                if tok_kind == 1 and tag_attrs:
                    tag_attrs[-1][1] += c

        elif state == ATTR_VALUE_UQ:
            # mod.rs:574-620
            if not recon and pos < n:
                m = _ATTRVAL_UQ_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    if tok_kind == 1 and tag_attrs:
                        tag_attrs[-1][1] += text[pos:j]
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c in _WS:
                state = BEFORE_ATTR_NAME
            elif c == "&":
                return_state = ATTR_VALUE_UQ
                state = CHAR_REF
            elif c == ">":
                state = DATA
                emit_current_tag()
            elif c == "\x00":
                if tok_kind == 1 and tag_attrs:
                    tag_attrs[-1][1] += REPLACEMENT
            else:
                if tok_kind == 1 and tag_attrs:
                    tag_attrs[-1][1] += c

        elif state == AFTER_ATTR_VALUE_Q:
            # mod.rs:623-657
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c in _WS:
                state = BEFORE_ATTR_NAME
            elif c == "/":
                state = SELF_CLOSING
            elif c == ">":
                state = DATA
                emit_current_tag()
            else:
                recon = True
                state = BEFORE_ATTR_NAME

        elif state == SELF_CLOSING:
            # mod.rs:660-685
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == ">":
                if tok_kind == 1:
                    tag_self_closing = True
                state = DATA
                emit_current_tag()
            else:
                recon = True
                state = BEFORE_ATTR_NAME

        elif state == BOGUS_COMMENT:
            # mod.rs:688-715
            if not recon and pos < n:
                m = _BOGUS_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    if tok_kind == 2:
                        comment_data += text[pos:j]
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = DATA
                emit_comment()
            elif c == ">":
                state = DATA
                emit_comment()
            elif c == "\x00":
                if tok_kind == 2:
                    comment_data += REPLACEMENT
            else:
                if tok_kind == 2:
                    comment_data += c

        elif state == AMBIGUOUS_AMPERSAND:
            # mod.rs:883-915 — ASCII alpha only; digits hit "anything else"
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = return_state
            elif c in _ASCII_ALPHA:
                if return_state in _ATTR_VALUE_STATES:
                    if tok_kind == 1 and tag_attrs:
                        tag_attrs[-1][1] += c
                else:
                    emit_chars(c, cur_idx, cur_idx + 1)
            else:
                recon = True
                state = return_state

        elif state == MARKUP_DECL_OPEN:
            # mod.rs:1098-1126 — NO EOF arm in the reference: hangs forever
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                status = HANG
                emit_eof()
            elif c == "-":
                # consume_double_hyphen (mod.rs:3458-3487); reconsume first
                recon = True
                count = 0
                while count < 2:
                    if recon:
                        recon = False
                        c2 = cur
                    elif pos < n:
                        c2 = cur = text[pos]
                        cur_idx = pos
                        pos += 1
                    else:
                        c2 = cur = None
                        cur_idx = n
                    if c2 is None:
                        break
                    if c2 == "-":
                        count += 1
                    else:
                        break
                tok_kind = 2
                comment_data = "-" * count if count < 2 else ""
                if count == 2:
                    state = COMMENT_START
                else:
                    recon = True
                    state = BOGUS_COMMENT
            elif c == "D":
                # consume_doctype (mod.rs:3489-3518) — only uppercase 'D'
                # dispatches; remaining chars case-insensitive; partial match
                # appends the UPPERCASE goal chars to a bogus comment
                recon = True
                goal = "DOCTYPE"
                index = 0
                while index < 7:
                    if recon:
                        recon = False
                        c2 = cur
                    elif pos < n:
                        c2 = cur = text[pos]
                        cur_idx = pos
                        pos += 1
                    else:
                        c2 = cur = None
                        cur_idx = n
                    if c2 is None:
                        break
                    if (
                        chr(ord(c2) - 0x20)
                        if c2 in "abcdefghijklmnopqrstuvwxyz"
                        else c2
                    ) == goal[index]:
                        index += 1
                    else:
                        break
                if index == 7:
                    state = DOCTYPE
                else:
                    tok_kind = 2
                    comment_data = goal[:index]
                    recon = True
                    state = BOGUS_COMMENT
            elif c == "[":
                # consume_cdata (mod.rs:3520-3552) — case-sensitive, always
                # enters CDATA (no adjusted-current-node check)
                recon = True
                goal = "[CDATA["
                index = 0
                while index < 7:
                    if recon:
                        recon = False
                        c2 = cur
                    elif pos < n:
                        c2 = cur = text[pos]
                        cur_idx = pos
                        pos += 1
                    else:
                        c2 = cur = None
                        cur_idx = n
                    if c2 is None:
                        break
                    if c2 == goal[index]:
                        index += 1
                    else:
                        break
                if index == 7:
                    state = CDATA_SECTION
                else:
                    tok_kind = 2
                    comment_data = goal[:index]
                    recon = True
                    state = BOGUS_COMMENT
            else:
                tok_kind = 2
                comment_data = ""
                recon = True
                state = BOGUS_COMMENT

        elif state == COMMENT_START:
            # mod.rs:1129-1153
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = COMMENT
            elif c == "-":
                state = COMMENT_START_DASH
            elif c == ">":
                state = DATA
                emit_comment()
            else:
                recon = True
                state = COMMENT

        elif state == COMMENT_START_DASH:
            # mod.rs:1156-1185
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_comment()
                emit_eof()
            elif c == "-":
                state = COMMENT_END
            elif c == ">":
                state = DATA
                emit_comment()
            else:
                if tok_kind == 2:
                    comment_data += "-"
                recon = True
                state = COMMENT

        elif state == COMMENT:
            # mod.rs:1188-1221
            if not recon and pos < n:
                m = _COMMENT_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    if tok_kind == 2:
                        comment_data += text[pos:j]
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_comment()
                emit_eof()
            elif c == "<":
                if tok_kind == 2:
                    comment_data += c
                state = COMMENT_LTS
            elif c == "-":
                state = COMMENT_END_DASH
            elif c == "\x00":
                if tok_kind == 2:
                    comment_data += REPLACEMENT
            else:
                if tok_kind == 2:
                    comment_data += c

        elif state == COMMENT_LTS:
            # mod.rs:1304-1329
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = COMMENT
            elif c == "!":
                if tok_kind == 2:
                    comment_data += c
                state = COMMENT_LTS_BANG
            elif c == "<":
                if tok_kind == 2:
                    comment_data += c
            else:
                recon = True
                state = COMMENT

        elif state == COMMENT_LTS_BANG:
            # mod.rs:1332-1351
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = COMMENT
            elif c == "-":
                state = COMMENT_LTS_BANG_DASH
            else:
                recon = True
                state = COMMENT

        elif state == COMMENT_LTS_BANG_DASH:
            # mod.rs:1354-1373
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = COMMENT_END_DASH
            elif c == "-":
                state = COMMENT_LTS_BANG_DASH_DASH
            else:
                recon = True
                state = COMMENT_END_DASH

        elif state == COMMENT_LTS_BANG_DASH_DASH:
            # mod.rs:1376-1395 — all arms reconsume in comment end
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            recon = True
            state = COMMENT_END

        elif state == COMMENT_END_DASH:
            # mod.rs:1398-1416 — NO EOF arm in the reference: hangs forever
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                status = HANG
                emit_eof()
            elif c == "-":
                state = COMMENT_END
            else:
                if tok_kind == 2:
                    comment_data += "-"
                recon = True
                state = COMMENT

        elif state == COMMENT_END:
            # mod.rs:1224-1262
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_comment()
                emit_eof()
            elif c == ">":
                state = DATA
                emit_comment()
            elif c == "!":
                state = COMMENT_END_BANG
            elif c == "-":
                if tok_kind == 2:
                    comment_data += "-"
            else:
                if tok_kind == 2:
                    comment_data += "--"
                recon = True
                state = COMMENT

        elif state == COMMENT_END_BANG:
            # mod.rs:1265-1301
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_comment()
                emit_eof()
            elif c == "-":
                if tok_kind == 2:
                    comment_data += "--!"
                state = COMMENT_END_DASH
            elif c == ">":
                state = DATA
                emit_comment()
            else:
                if tok_kind == 2:
                    comment_data += "--!"
                recon = True
                state = COMMENT

        elif state == DOCTYPE:
            # mod.rs:1419-1453
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                tok_kind = 3
                dt_name = ""
                dt_public = None
                dt_system = None
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c in _WS:
                state = BEFORE_DOCTYPE_NAME
            else:  # '>' and anything else both reconsume
                recon = True
                state = BEFORE_DOCTYPE_NAME

        elif state == BEFORE_DOCTYPE_NAME:
            # mod.rs:1456-1513
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                tok_kind = 3
                dt_name = ""
                dt_public = None
                dt_system = None
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c in _WS:
                pass
            elif c in _ASCII_UPPER:
                tok_kind = 3
                dt_name = chr(ord(c) + 0x20)
                dt_public = None
                dt_system = None
                dt_quirks = False
                state = DOCTYPE_NAME
            elif c == "\x00":
                tok_kind = 3
                dt_name = REPLACEMENT
                dt_public = None
                dt_system = None
                dt_quirks = False
                state = DOCTYPE_NAME
            elif c == ">":
                tok_kind = 3
                dt_name = ""
                dt_public = None
                dt_system = None
                dt_quirks = True
                state = DATA
                emit_doctype()
            else:
                tok_kind = 3
                dt_name = c
                dt_public = None
                dt_system = None
                dt_quirks = False
                state = DOCTYPE_NAME

        elif state == DOCTYPE_NAME:
            # mod.rs:1516-1562
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c in _WS:
                state = AFTER_DOCTYPE_NAME
            elif c == ">":
                state = DATA
                emit_doctype()
            elif c in _ASCII_UPPER:
                dt_name += chr(ord(c) + 0x20)
            elif c == "\x00":
                dt_name += REPLACEMENT
            else:
                dt_name += c

        elif state == AFTER_DOCTYPE_NAME:
            # mod.rs:1565-1612 — NO EOF arm in the reference: hangs forever
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                status = HANG
                emit_eof()
            elif c in _WS:
                pass
            elif c == ">":
                state = DATA
                emit_doctype()
            else:
                u = chr(ord(c) - 0x20) if "a" <= c <= "z" else c
                if u == "P":
                    # consume_public_keyword (mod.rs:3434-3456)
                    recon = True
                    goal = "PUBLIC"
                    index = 0
                    while index < 6:
                        if recon:
                            recon = False
                            c2 = cur
                        elif pos < n:
                            c2 = cur = text[pos]
                            cur_idx = pos
                            pos += 1
                        else:
                            c2 = cur = None
                            cur_idx = n
                        if c2 is None:
                            break
                        if (
                            chr(ord(c2) - 0x20)
                            if "a" <= c2 <= "z"
                            else c2
                        ) == goal[index]:
                            index += 1
                        else:
                            break
                    if index == 6:
                        state = AFTER_PUBLIC_KEYWORD
                    else:
                        recon = True
                        state = BOGUS_DOCTYPE
                elif u == "S":
                    # consume_system_keyword (mod.rs:3410-3432)
                    recon = True
                    goal = "SYSTEM"
                    index = 0
                    while index < 6:
                        if recon:
                            recon = False
                            c2 = cur
                        elif pos < n:
                            c2 = cur = text[pos]
                            cur_idx = pos
                            pos += 1
                        else:
                            c2 = cur = None
                            cur_idx = n
                        if c2 is None:
                            break
                        if (
                            chr(ord(c2) - 0x20)
                            if "a" <= c2 <= "z"
                            else c2
                        ) == goal[index]:
                            index += 1
                        else:
                            break
                    if index == 6:
                        state = AFTER_SYSTEM_KEYWORD
                    else:
                        recon = True
                        state = BOGUS_DOCTYPE
                else:
                    dt_quirks = True
                    recon = True
                    state = BOGUS_DOCTYPE

        elif state == AFTER_PUBLIC_KEYWORD:
            # mod.rs:1615-1669
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c in _WS:
                state = BEFORE_PUBLIC_ID
            elif c == '"':
                dt_public = ""
                state = PUBLIC_ID_DQ
            elif c == "'":
                dt_public = ""
                state = PUBLIC_ID_SQ
            elif c == ">":
                dt_quirks = True
                state = DATA
                emit_doctype()
            else:
                dt_quirks = True
                recon = True
                state = BOGUS_DOCTYPE

        elif state == BEFORE_PUBLIC_ID:
            # mod.rs:1705-1756
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c in _WS:
                pass
            elif c == '"':
                dt_public = ""
                state = PUBLIC_ID_DQ
            elif c == "'":
                dt_public = ""
                state = PUBLIC_ID_SQ
            elif c == ">":
                dt_quirks = True
                state = DATA
                emit_doctype()
            else:
                dt_quirks = True
                recon = True
                state = BOGUS_DOCTYPE

        elif state == PUBLIC_ID_DQ:
            # mod.rs:1759-1799
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c == '"':
                state = AFTER_PUBLIC_ID
            elif c == "\x00":
                if dt_public is not None:
                    dt_public += REPLACEMENT
            elif c == ">":
                dt_quirks = True
                state = DATA
                emit_doctype()
            else:
                if dt_public is not None:
                    dt_public += c

        elif state == PUBLIC_ID_SQ:
            # mod.rs:1802-1842
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c == "'":
                state = AFTER_PUBLIC_ID
            elif c == "\x00":
                if dt_public is not None:
                    dt_public += REPLACEMENT
            elif c == ">":
                dt_quirks = True
                state = DATA
                emit_doctype()
            else:
                if dt_public is not None:
                    dt_public += c

        elif state == AFTER_PUBLIC_ID:
            # mod.rs:1845-1899
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c in _WS:
                state = BETWEEN_PUB_SYS
            elif c == ">":
                state = DATA
                emit_doctype()
            elif c == '"':
                dt_system = ""
                state = SYSTEM_ID_DQ
            elif c == "'":
                dt_system = ""
                state = SYSTEM_ID_SQ
            else:
                dt_quirks = True
                recon = True
                state = BOGUS_DOCTYPE

        elif state == BETWEEN_PUB_SYS:
            # mod.rs:1902-1955
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c in _WS:
                pass
            elif c == ">":
                state = DATA
                emit_doctype()
            elif c == '"':
                dt_system = ""
                state = SYSTEM_ID_DQ
            elif c == "'":
                dt_system = ""
                state = SYSTEM_ID_SQ
            else:
                dt_quirks = True
                recon = True
                state = BOGUS_DOCTYPE

        elif state == AFTER_SYSTEM_KEYWORD:
            # mod.rs:1958-2016
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c in _WS:
                state = BEFORE_SYSTEM_ID
            elif c == '"':
                dt_system = ""
                state = SYSTEM_ID_DQ
            elif c == "'":
                dt_system = ""
                state = SYSTEM_ID_SQ
            elif c == ">":
                dt_quirks = True
                state = DATA
                emit_doctype()
            else:
                dt_quirks = True
                recon = True
                state = BOGUS_DOCTYPE

        elif state == BEFORE_SYSTEM_ID:
            # mod.rs:2019-2074
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c in _WS:
                pass
            elif c == '"':
                dt_system = ""
                state = SYSTEM_ID_DQ
            elif c == "'":
                dt_system = ""
                state = SYSTEM_ID_SQ
            elif c == ">":
                dt_quirks = True
                state = DATA
                emit_doctype()
            else:
                dt_quirks = True
                recon = True
                state = BOGUS_DOCTYPE

        elif state == SYSTEM_ID_DQ:
            # mod.rs:2077-2117
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c == '"':
                state = AFTER_SYSTEM_ID
            elif c == "\x00":
                if dt_system is not None:
                    dt_system += REPLACEMENT
            elif c == ">":
                dt_quirks = True
                state = DATA
                emit_doctype()
            else:
                if dt_system is not None:
                    dt_system += c

        elif state == SYSTEM_ID_SQ:
            # mod.rs:2120-2160
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                dt_quirks = True
                emit_doctype()
                emit_eof()
            elif c == "'":
                state = AFTER_SYSTEM_ID
            elif c == "\x00":
                if dt_system is not None:
                    dt_system += REPLACEMENT
            elif c == ">":
                dt_quirks = True
                state = DATA
                emit_doctype()
            else:
                if dt_system is not None:
                    dt_system += c

        elif state == AFTER_SYSTEM_ID:
            # mod.rs:2163-2196
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_doctype()
                emit_eof()
            elif c in _WS:
                pass
            elif c == ">":
                state = DATA
                emit_doctype()
            else:
                recon = True
                state = BOGUS_DOCTYPE

        elif state == BOGUS_DOCTYPE:
            # mod.rs:1672-1702 — swallows until '>'
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_doctype()
                emit_eof()
            elif c == ">":
                state = DATA
                emit_doctype()
            # else: ignore

        elif state == NUMERIC_CHAR_REF:
            # mod.rs:918-942
            char_ref_code = 0
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = DEC_CHAR_REF_START
            elif c == "x" or c == "X":
                temp_buf += c
                state = HEX_CHAR_REF_START
            else:
                recon = True
                state = DEC_CHAR_REF_START

        elif state == HEX_CHAR_REF_START:
            # mod.rs:945-961 — EOF arm reconsumes WITHOUT flushing (quirk:
            # "&#x" at EOF is swallowed)
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = return_state
            elif c in _ASCII_HEX:
                recon = True
                state = HEX_CHAR_REF
            else:
                # flush_code_points... then reconsume in return state
                if temp_buf is not None:
                    if return_state in _ATTR_VALUE_STATES:
                        if tok_kind == 1 and tag_attrs:
                            tag_attrs[-1][1] += temp_buf
                    else:
                        emit_chars(temp_buf, amp_src, cur_idx)
                    temp_buf = None
                recon = True
                state = return_state

        elif state == DEC_CHAR_REF_START:
            # mod.rs:964-981
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                if temp_buf is not None:
                    if return_state in _ATTR_VALUE_STATES:
                        if tok_kind == 1 and tag_attrs:
                            tag_attrs[-1][1] += temp_buf
                    else:
                        emit_chars(temp_buf, amp_src, cur_idx)
                    temp_buf = None
                recon = True
                state = return_state
            elif c in _ASCII_DIGIT:
                recon = True
                state = DEC_CHAR_REF
            else:
                if temp_buf is not None:
                    if return_state in _ATTR_VALUE_STATES:
                        if tok_kind == 1 and tag_attrs:
                            tag_attrs[-1][1] += temp_buf
                    else:
                        emit_chars(temp_buf, amp_src, cur_idx)
                    temp_buf = None
                recon = True
                state = return_state

        elif state == HEX_CHAR_REF:
            # mod.rs:984-1020 — u32 wraparound like a Rust release build
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = NUMERIC_CHAR_REF_END
            elif c in _ASCII_DIGIT:
                char_ref_code = (char_ref_code * 16 + (ord(c) - 0x30)) & 0xFFFFFFFF
            elif c in _ASCII_HEX:
                if "A" <= c <= "F":
                    char_ref_code = (char_ref_code * 16 + (ord(c) - 0x37)) & 0xFFFFFFFF
                else:
                    char_ref_code = (char_ref_code * 16 + (ord(c) - 0x57)) & 0xFFFFFFFF
            elif c == ";":
                state = NUMERIC_CHAR_REF_END
            else:
                recon = True
                state = NUMERIC_CHAR_REF_END

        elif state == DEC_CHAR_REF:
            # mod.rs:1023-1045
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                recon = True
                state = NUMERIC_CHAR_REF_END
            elif c in _ASCII_DIGIT:
                char_ref_code = (char_ref_code * 10 + (ord(c) - 0x30)) & 0xFFFFFFFF
            elif c == ";":
                state = NUMERIC_CHAR_REF_END
            else:
                recon = True
                state = NUMERIC_CHAR_REF_END

        elif state == NUMERIC_CHAR_REF_END:
            # mod.rs:1048-1095 — does not consume; reconsume flag (if set by
            # the digit states) survives into the return state
            code = char_ref_code
            if code == 0x00:
                code = 0xFFFD
            if code > 0x10FFFF:
                code = 0xFFFD
            if is_numeric_surrogate(code):
                code = 0xFFFD
            if is_numeric_noncharacter(code):
                code = 0xFFFD
            if code == 0x0D or (
                is_numeric_control(code) and not is_numeric_whitespace(code)
            ):
                code = replace_control(code)
            char_ref_code = code
            try:
                decoded = chr(code)
            except ValueError:
                decoded = REPLACEMENT
            # surrogate range is clamped above, but chr() of a surrogate is
            # legal in Python and was not in Rust — keep the guard cheap
            temp_buf = decoded
            if return_state in _ATTR_VALUE_STATES:
                if tok_kind == 1 and tag_attrs:
                    tag_attrs[-1][1] += temp_buf
            else:
                end = cur_idx + 1 if cur is not None and not recon else cur_idx
                emit_chars(temp_buf, amp_src, min(end, n))
            temp_buf = None
            state = return_state

        elif state == CDATA_SECTION:
            # mod.rs:2199-2223 — emits chars raw
            if not recon and pos < n:
                j = text.find("]", pos)
                if j == -1:
                    j = n
                if j > pos:
                    emit_chars(text[pos:j], pos, j)
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == "]":
                state = CDATA_BRACKET
            else:
                emit_chars(c, cur_idx, cur_idx + 1)
                cur = None

        elif state == CDATA_BRACKET:
            # mod.rs:2226-2249
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_chars("]", cur_idx - 1, cur_idx)
                recon = True
                state = CDATA_SECTION
            elif c == "]":
                state = CDATA_END
            else:
                emit_chars("]", cur_idx - 1, cur_idx)
                recon = True
                state = CDATA_SECTION

        elif state == CDATA_END:
            # mod.rs:2252-2284
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_chars("]]", cur_idx - 2, cur_idx)
                emit_eof()
            elif c == "]":
                emit_chars("]", cur_idx - 1, cur_idx)
            elif c == ">":
                state = DATA
            else:
                emit_chars("]]", cur_idx - 2, cur_idx)
                recon = True
                state = CDATA_SECTION


        # ------------------------------------------------------------------
        # RCDATA / RAWTEXT / script-data / PLAINTEXT families — reachable
        # only via ``initial_state`` (reference topology: unreachable,
        # SURVEY.md §2.4).  Spec-faithful like the reference, including its
        # deviation: the "appropriate end tag" check compares against
        # ``open_tags[-1]`` instead of the last start tag emitted
        # (mod.rs:3724-3736), and the '>' arm emits through the *generic*
        # emitter, bypassing the stack filter (mod.rs:3738-3743).

        elif state == RCDATA:
            # mod.rs:2287-2321
            if not recon and pos < n:
                m = _RCDATA_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    emit_chars(text[pos:j], pos, j)
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == "&":
                return_state = RCDATA
                state = CHAR_REF
            elif c == "<":
                lt_idx = cur_idx
                state = RCDATA_LTS
            elif c == "\x00":
                emit_chars(REPLACEMENT, cur_idx, cur_idx + 1)
            else:
                emit_chars(c, cur_idx, cur_idx + 1)
                cur = None

        elif state == RAWTEXT or state == SCRIPT_DATA:
            # mod.rs:2324-2349, 2352-2379 (identical shapes)
            if not recon and pos < n:
                m = _RAWTEXT_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    emit_chars(text[pos:j], pos, j)
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == "<":
                lt_idx = cur_idx
                state = _RAWTEXTISH[state]
            elif c == "\x00":
                emit_chars(REPLACEMENT, cur_idx, cur_idx + 1)
            else:
                emit_chars(c, cur_idx, cur_idx + 1)
                cur = None

        elif state == PLAINTEXT:
            # mod.rs:2382-2399
            if not recon and pos < n:
                m = _NUL_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    emit_chars(text[pos:j], pos, j)
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == "\x00":
                emit_chars(REPLACEMENT, cur_idx, cur_idx + 1)
            else:
                emit_chars(c, cur_idx, cur_idx + 1)
                cur = None

        elif state == RCDATA_LTS or state == RAWTEXT_LTS:
            # mod.rs:2402-2426, 2552-2576
            back = RCDATA if state == RCDATA_LTS else RAWTEXT
            eto = RCDATA_END_TAG_OPEN if state == RCDATA_LTS else RAWTEXT_END_TAG_OPEN
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c == "/":
                temp_buf = ""
                state = eto
            else:
                emit_chars("<", lt_idx, lt_idx + 1)
                recon = True
                state = back

        elif state == SCRIPT_LTS:
            # mod.rs:2692-2724
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c == "/":
                temp_buf = ""
                state = SCRIPT_END_TAG_OPEN
            elif c == "!":
                state = SCRIPT_ESCAPE_START
                emit_chars("<!", lt_idx, lt_idx + 2)
            else:
                emit_chars("<", lt_idx, lt_idx + 1)
                recon = True
                state = SCRIPT_DATA

        elif state in _ETO_FAMILY:
            # mod.rs:2429-2451, 2579-2601, 2727-2749, 3040-3062
            name_state, back = _ETO_FAMILY[state]
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is not None and c in _ASCII_ALPHA:
                tok_kind = 1
                tag_is_end = True
                tag_name = ""
                tag_attrs = []
                tag_self_closing = False
                recon = True
                state = name_state
            else:
                emit_chars("</", lt_idx, lt_idx + 2)
                recon = True
                state = back

        elif state in _ETN_FAMILY:
            # mod.rs:2454-2549, 2604-2689, 2752-2838, 3065-3160
            back = _ETN_FAMILY[state]
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            appropriate = bool(open_tags) and open_tags[-1] == tag_name
            if c is not None and c in _WS and appropriate:
                state = BEFORE_ATTR_NAME
            elif c == "/" and appropriate:
                state = SELF_CLOSING
            elif c == ">" and appropriate:
                state = DATA
                emit_doctype()  # generic emitter — bypasses the stack filter
            elif c is not None and c in _ASCII_UPPER:
                tag_name += chr(ord(c) + 0x20)
                temp_buf = (temp_buf or "") + c
            elif c is not None and c in _ASCII_LOWER:
                tag_name += c
                temp_buf = (temp_buf or "") + c
            elif c is None and state in (
                RAWTEXT_END_TAG_NAME,
                SCRIPT_END_TAG_NAME,
            ):
                # mod.rs rawtext_end_tag_name_state /
                # script_data_end_tag_name_state: NO EOF arm in the
                # reference (unlike the rcdata/script-escaped twins, which
                # spec-compliantly re-emit + reconsume) — hangs forever.
                # Found by probe-v2 binary differential (RAWTEXT "</title").
                status = HANG
                emit_eof()
            else:
                buf = temp_buf if temp_buf is not None else ""
                emit_chars("</" + buf, lt_idx, lt_idx + 2 + len(buf))
                recon = True
                state = back

        elif state == SCRIPT_ESCAPE_START or state == SCRIPT_ESCAPE_START_DASH:
            # mod.rs:2841-2859, 2862-2881
            nxt = (
                SCRIPT_ESCAPE_START_DASH
                if state == SCRIPT_ESCAPE_START
                else SCRIPT_ESCAPED_DASH_DASH
            )
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c == "-":
                state = nxt
                emit_chars("-", cur_idx, cur_idx + 1)
            else:
                recon = True
                state = SCRIPT_DATA

        elif state == SCRIPT_ESCAPED or state == SCRIPT_DOUBLE_ESCAPED:
            # mod.rs:2884-2918, 3214-3249
            dbl = state == SCRIPT_DOUBLE_ESCAPED
            if not recon and pos < n:
                m = _ESCAPED_BREAK.search(text, pos)
                j = m.start() if m else n
                if j > pos:
                    emit_chars(text[pos:j], pos, j)
                    pos = j
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == "-":
                state = SCRIPT_DOUBLE_ESCAPED_DASH if dbl else SCRIPT_ESCAPED_DASH
                emit_chars("-", cur_idx, cur_idx + 1)
            elif c == "<":
                lt_idx = cur_idx
                if dbl:
                    state = SCRIPT_DOUBLE_ESCAPED_LTS
                    emit_chars("<", cur_idx, cur_idx + 1)
                else:
                    state = SCRIPT_ESCAPED_LTS
            elif c == "\x00":
                emit_chars(REPLACEMENT, cur_idx, cur_idx + 1)
            else:
                emit_chars(c, cur_idx, cur_idx + 1)
                cur = None

        elif state == SCRIPT_ESCAPED_DASH or state == SCRIPT_DOUBLE_ESCAPED_DASH:
            # mod.rs:2921-2957, 3252-3289
            dbl = state == SCRIPT_DOUBLE_ESCAPED_DASH
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == "-":
                state = (
                    SCRIPT_DOUBLE_ESCAPED_DASH_DASH if dbl else SCRIPT_ESCAPED_DASH_DASH
                )
                emit_chars("-", cur_idx, cur_idx + 1)
            elif c == "<":
                lt_idx = cur_idx
                if dbl:
                    state = SCRIPT_DOUBLE_ESCAPED_LTS
                    emit_chars("<", cur_idx, cur_idx + 1)
                else:
                    state = SCRIPT_ESCAPED_LTS
            elif c == "\x00":
                state = SCRIPT_DOUBLE_ESCAPED if dbl else SCRIPT_ESCAPED
                emit_chars(REPLACEMENT, cur_idx, cur_idx + 1)
            else:
                state = SCRIPT_DOUBLE_ESCAPED if dbl else SCRIPT_ESCAPED
                emit_chars(c, cur_idx, cur_idx + 1)
                cur = None

        elif (
            state == SCRIPT_ESCAPED_DASH_DASH
            or state == SCRIPT_DOUBLE_ESCAPED_DASH_DASH
        ):
            # mod.rs:2960-3002, 3292-3334
            dbl = state == SCRIPT_DOUBLE_ESCAPED_DASH_DASH
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is None:
                emit_eof()
            elif c == "-":
                emit_chars("-", cur_idx, cur_idx + 1)
            elif c == "<":
                lt_idx = cur_idx
                if dbl:
                    # reference deviation: the double_escaped_dash_dash
                    # '<' arm's spec comment says emit '<' but the code
                    # only switches (double_escaped_dash DOES emit) —
                    # found by probe-v2 differential
                    # ("<!--<script><!--<script>" from ScriptData)
                    state = SCRIPT_DOUBLE_ESCAPED_LTS
                else:
                    state = SCRIPT_ESCAPED_LTS
            elif c == ">":
                state = SCRIPT_DATA
                emit_chars(">", cur_idx, cur_idx + 1)
            elif c == "\x00":
                state = SCRIPT_DOUBLE_ESCAPED if dbl else SCRIPT_ESCAPED
                emit_chars(REPLACEMENT, cur_idx, cur_idx + 1)
            else:
                state = SCRIPT_DOUBLE_ESCAPED if dbl else SCRIPT_ESCAPED
                emit_chars(c, cur_idx, cur_idx + 1)
                cur = None

        elif state == SCRIPT_ESCAPED_LTS:
            # mod.rs:3005-3037
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c == "/":
                temp_buf = ""
                state = SCRIPT_ESCAPED_END_TAG_OPEN
            elif c is not None and c in _ASCII_ALPHA:
                temp_buf = ""
                emit_chars("<", lt_idx, lt_idx + 1)
                recon = True
                state = SCRIPT_DOUBLE_ESCAPE_START
            else:
                emit_chars("<", lt_idx, lt_idx + 1)
                recon = True
                state = SCRIPT_ESCAPED

        elif state == SCRIPT_DOUBLE_ESCAPED_LTS:
            # mod.rs:3337-3357
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c == "/":
                temp_buf = ""
                state = SCRIPT_DOUBLE_ESCAPE_END
                emit_chars("/", cur_idx, cur_idx + 1)
            else:
                recon = True
                state = SCRIPT_DOUBLE_ESCAPED

        elif state in _DBL_ESCAPE:
            # mod.rs:3163-3211, 3360-3408 — NB the reference emits the
            # terminator char only in the buffer-mismatch arm
            match_state, else_state = _DBL_ESCAPE[state]
            anything_else = (
                SCRIPT_ESCAPED
                if state == SCRIPT_DOUBLE_ESCAPE_START
                else SCRIPT_DOUBLE_ESCAPED
            )
            if recon:
                recon = False
                c = cur
            elif pos < n:
                c = cur = text[pos]
                cur_idx = pos
                pos += 1
            else:
                c = cur = None
                cur_idx = n
            if c is not None and (c in _WS or c == "/" or c == ">"):
                if (temp_buf if temp_buf is not None else "") == "script":
                    state = match_state
                else:
                    state = else_state
                    emit_chars(c, cur_idx, cur_idx + 1)
                    cur = None
            elif c is not None and c in _ASCII_UPPER:
                temp_buf = (temp_buf or "") + chr(ord(c) + 0x20)
                emit_chars(c, cur_idx, cur_idx + 1)
                cur = None
            elif c is not None and c in _ASCII_LOWER:
                temp_buf = (temp_buf or "") + c
                emit_chars(c, cur_idx, cur_idx + 1)
                cur = None
            else:
                recon = True
                state = anything_else

        else:  # pragma: no cover — exhaustive 80-state dispatch
            raise AssertionError(f"unreachable state {state}")

    return tokens, status, err_count
