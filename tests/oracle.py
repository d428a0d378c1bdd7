"""Single-process, pure-Python ORACLE implementations of Stage 1 + Stage 2.

Independent code paths from the engine (html.parser.HTMLParser event
stream here vs regex passes in clip_retrieval_spark.functions.text), both
implementing the same normative spec. The test suite asserts:

* extracted text is BYTE-IDENTICAL per url (exact string equality), and
* triple P/R >= 0.95 on (url, subj, pred, obj) sets

— the analog of the reference's sequential-vs-pyspark distributor
equivalence test (reference tests/test_clip_inference/test_distributor.py:9-52).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from clip_retrieval_spark.functions.text import (  # spec constants only
    COPULA,
    INLINE_TAGS,
    PREP,
    VERB_LEX,
)

_SKIP_ELEMENTS = frozenset(
    ["script", "style", "noscript", "template", "nav", "footer", "header",
     "aside"]
)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_ELEMENTS:
            self.skip_depth += 1
        elif tag not in INLINE_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_ELEMENTS:
            if self.skip_depth > 0:
                self.skip_depth -= 1
        elif tag not in INLINE_TAGS:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag not in _SKIP_ELEMENTS and tag not in INLINE_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if self.skip_depth == 0:
            self.parts.append(data)


def oracle_extract_text(html_bytes: bytes | str | None) -> str:
    if html_bytes is None:
        return ""
    doc = (
        bytes(html_bytes).decode("utf-8", errors="replace")
        if isinstance(html_bytes, (bytes, bytearray, memoryview))
        else html_bytes
    )
    # spec step 2: an unterminated comment removes to end of document
    # (HTMLParser would otherwise surface it as trailing data)
    doc = re.sub(r"<!--(?:(?!-->).)*\Z", "", doc, flags=re.DOTALL)
    p = _Extractor()
    p.feed(doc)
    p.close()
    out_lines = []
    for line in "".join(p.parts).split("\n"):
        collapsed = re.sub(r"[ \t\r\f\v\xa0]+", " ", line).strip()
        if collapsed:
            out_lines.append(collapsed)
    return "\n".join(out_lines)


# --- triples (event-stream style implementation, same spec) -----------------

_SENT_BOUND = re.compile(r"(?<=[.!?])\s+")
_TOKENS = re.compile(r"[A-Za-z0-9][A-Za-z0-9&'\-]*")
_STOP_SINGLETONS = {"The", "A", "An", "This", "It", "But", "And"}


def _oracle_pred_ok(gap):
    if not gap or len(gap) > 5:
        return False
    if any(not (t.isascii() and t.isalpha() and t.islower()) for t in gap):
        return False
    h = gap[0]
    return (
        h in VERB_LEX
        or (len(h) > 3 and h[-2:] in ("ed", "es"))
        or (len(gap) >= 2 and h in COPULA and gap[-1] in PREP)
    )


def oracle_extract_triples(text: str):
    """Returns list of (sent_id, subj, pred, obj)."""
    triples = []
    sent_id = -1
    for line in text.split("\n"):
        for sent in _SENT_BOUND.split(line):
            if not sent.strip():
                continue
            sent_id += 1
            toks = _TOKENS.findall(sent)
            # walk tokens collecting capitalized runs
            runs, cur = [], []
            for idx, t in enumerate(toks):
                if t[0].isupper() and t[0].isascii():
                    cur.append(idx)
                else:
                    if cur:
                        runs.append((cur[0], cur[-1] + 1))
                    cur = []
            if cur:
                runs.append((cur[0], cur[-1] + 1))
            runs = [
                (s, e)
                for (s, e) in runs
                if not (e - s == 1 and toks[s] in _STOP_SINGLETONS)
            ]
            for (s1, e1), (s2, e2) in zip(runs, runs[1:]):
                gap = toks[e1:s2]
                if _oracle_pred_ok(gap):
                    triples.append(
                        (
                            sent_id,
                            " ".join(toks[s1:e1]),
                            " ".join(gap),
                            " ".join(toks[s2:e2]),
                        )
                    )
    return triples
