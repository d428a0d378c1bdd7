"""Stage 2 tests: triple P/R >= 0.95 vs oracle (it should be 1.0 on the
synthetic corpus), span correctness, determinism."""

from __future__ import annotations

from clip_retrieval_spark.fixtures import gen_pages_local, pages_df
from clip_retrieval_spark.functions.text import extract_text, extract_triples
from clip_retrieval_spark.operators.extract import extract_pages
from clip_retrieval_spark.operators.triples import extract_triples_df

from tests.oracle import oracle_extract_text, oracle_extract_triples

N = 200


def _oracle_triple_set(n):
    out = set()
    for (url, _ts, html, _t, _lang) in gen_pages_local(n):
        for (_sid, s, p, o) in oracle_extract_triples(oracle_extract_text(html)):
            out.add((url, s, p, o))
    return out


def test_spark_triples_pr_vs_oracle(spark):
    triples = extract_triples_df(extract_pages(pages_df(spark, N)))
    got = {
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in triples.select("url", "subj", "pred", "obj").collect()
    }
    want = _oracle_triple_set(N)
    inter = len(got & want)
    precision = inter / max(len(got), 1)
    recall = inter / max(len(want), 1)
    assert precision >= 0.95, precision
    assert recall >= 0.95, recall


def test_triple_spans_index_tokens():
    text = "Acme Corp acquired Beta Systems."
    (sid, s, p, o, s1, e1, s2, e2) = extract_triples(text)[0]
    assert (sid, s, p, o) == (0, "Acme Corp", "acquired", "Beta Systems")
    assert (s1, e1, s2, e2) == (0, 2, 3, 5)


def test_triple_unit_cases():
    cases = {
        # copula + preposition pattern
        "Globex is based in Springfield.":
            [("Globex", "is based in", "Springfield")],
        # -ed heuristic verb outside lexicon
        "Initech donated Umbrella Labs.":
            [("Initech", "donated", "Umbrella Labs")],
        # stopword singleton is not a subject
        "The Acme Corp acquired Globex.":
            [("The Acme Corp", "acquired", "Globex")],
        # gap too long -> no triple
        "Acme one two three four five six Globex.": [],
        # gap containing a non-lowercase-alpha token -> no triple
        "Acme xQ7 acquired Globex.": [],
        # two triples, one sentence each
        "Acme owns Globex. Hooli backs Initech.":
            [("Acme", "owns", "Globex"), ("Hooli", "backs", "Initech")],
    }
    for text, want in cases.items():
        got = [(s, p, o) for (_sid, s, p, o, *_sp) in extract_triples(text)]
        assert got == want, (text, got)
        got_o = [(s, p, o) for (_sid, s, p, o) in oracle_extract_triples(text)]
        assert got_o == want, (text, got_o)


def test_sent_ids_monotonic_per_page():
    text = extract_text(gen_pages_local(3)[1][2])
    sids = [t[0] for t in extract_triples(text)]
    assert sids == sorted(sids)
