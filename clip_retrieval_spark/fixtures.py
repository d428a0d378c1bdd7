"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Pages have the exact BASELINE.json ``input_hint`` shape:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Skew is present by construction:
* head-domain skew — hosts drawn zipfian (s≈1.2) over 100 domains;
* hub-entity skew — HUB_ENTITIES appear on a large fraction of pages.

Entity vocabulary contains alias variants ("Acme Corp" / "Acme
Corporation") so entity linking + canonicalization have true merges to
find. Every page is generated from ``seed + page_id`` only, so generation
is order-independent and can run distributed (``pages_df`` uses
``mapInPandas`` over ``spark.range``) or on the driver (``gen_page``),
producing identical rows either way — the property the reference asserts
across its sequential/pyspark distributors
(reference tests/test_clip_inference/test_distributor.py:9-52).
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42
N_HOSTS = 100
_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), False),
    ]
)

# --- entity vocabulary (closed; aliases give CC true merges) ---------------

# Each inner list is one true entity; all surfaces in it should canonicalize
# together. First 3 entities are hubs.
ENTITY_ALIASES: list[list[str]] = [
    ["Acme Corp", "Acme Corporation", "Acme"],
    ["Globex", "Globex Inc", "Globex Incorporated"],
    ["Initech", "Initech LLC"],
    ["Umbrella Labs", "Umbrella Laboratories"],
    ["Stark Industries", "Stark Ind"],
    ["Wayne Enterprises", "Wayne Ent"],
    ["Hooli", "Hooli Co"],
    ["Vandelay Industries", "Vandelay"],
    ["Wonka Factory", "Wonka Works"],
    ["Tyrell Corp", "Tyrell Corporation"],
    ["Cyberdyne Systems", "Cyberdyne"],
    ["Soylent Foods", "Soylent"],
    ["Aperture Science", "Aperture Sci"],
    ["Blue Sun", "Blue Sun Corp"],
    ["Nakatomi Trading", "Nakatomi Trading Co"],
    ["Oscorp", "Oscorp Industries"],
    ["Gringotts Bank", "Gringotts"],
    ["Duff Brewing", "Duff Brewery"],
    ["Sirius Cybernetics", "Sirius Cyber"],
    ["Omni Consumer Products", "Omni Consumer"],
]
PERSONS = [
    "Alice Johnson", "Bob Smith", "Carol Danvers", "David Chen",
    "Erin Brockovich", "Frank Castle", "Grace Hopper", "Henry Ford",
    "Irene Adler", "Jack Sparrow", "Karen Page", "Liam Neeson",
    "Maria Garcia", "Ned Stark", "Olivia Pope", "Peter Parker",
]
PLACES = [
    "Springfield", "Gotham City", "Metropolis", "Shelbyville",
    "Sunnydale", "Hill Valley", "Twin Peaks", "Emerald City",
    "Kings Landing", "New Troy",
]
HUB_ENTITIES = [a[0] for a in ENTITY_ALIASES[:3]]

SVO_VERBS = [
    "acquired", "founded", "launched", "bought", "hired", "owns",
    "operates", "backs", "supplies", "funds",
]
FILLER = [
    "the team shipped a new release last week.",
    "engineers reviewed the quarterly roadmap.",
    "the product received positive early feedback.",
    "a press briefing covered upcoming plans &amp; goals.",
    "caf&#233; culture influenced the office design.",
]
FILLER_NON_EN = {
    "fr": ["le projet avance bien cette semaine.",
           "une annonce est pr&#233;vue mardi."],
    "de": ["das projekt macht gute fortschritte.",
           "eine ank&#252;ndigung folgt am dienstag."],
    "es": ["el proyecto avanza bien esta semana.",
           "se espera un anuncio el martes."],
}

_BOILER_NAV = (
    "<nav><ul><li>Home Page</li><li>About Us</li><li>Contact Form</li>"
    "</ul></nav>"
)
_BOILER_FOOTER = (
    "<footer>Copyright 2024 Example Media. All rights reserved. "
    "Privacy Terms</footer>"
)
_BOILER_SCRIPT = "<script>var x = 1; track('pv', {page: 'x'});</script>"
_BOILER_STYLE = "<style>body { margin: 0; } .hero { color: red; }</style>"

# zipfian host weights, s=1.2 (head-domain skew by construction)
_HOST_WEIGHTS = [1.0 / (r ** 1.2) for r in range(1, N_HOSTS + 1)]
_HOST_CUM = []
_acc = 0.0
for _w in _HOST_WEIGHTS:
    _acc += _w
    _HOST_CUM.append(_acc)
_HOST_TOTAL = _acc


def _zipf_host(rng: random.Random) -> str:
    x = rng.random() * _HOST_TOTAL
    lo, hi = 0, N_HOSTS - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if _HOST_CUM[mid] < x:
            lo = mid + 1
        else:
            hi = mid
    return f"site{lo:03d}.example.com"


def _entity(rng: random.Random) -> str:
    # 35%: a hub entity; else uniform over all alias surfaces
    if rng.random() < 0.35:
        ent = ENTITY_ALIASES[rng.randrange(3)]
    else:
        ent = ENTITY_ALIASES[rng.randrange(len(ENTITY_ALIASES))]
    return ent[rng.randrange(len(ent))]


def _svo_sentence(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.5:
        s, o = _entity(rng), _entity(rng)
        v = SVO_VERBS[rng.randrange(len(SVO_VERBS))]
        return f"{s} {v} {o}."
    if kind < 0.75:
        s = _entity(rng)
        p = PLACES[rng.randrange(len(PLACES))]
        return f"{s} is based in {p}."
    p = PERSONS[rng.randrange(len(PERSONS))]
    o = _entity(rng)
    return f"{p} founded {o}."


def gen_page(page_id: int, seed: int = SEED) -> tuple:
    """One deterministic page row; depends only on (seed, page_id)."""
    rng = random.Random((seed << 24) ^ page_id)
    host = _zipf_host(rng)
    url = f"https://{host}/page-{page_id}"
    ts = _EPOCH + _dt.timedelta(seconds=page_id * 37)
    r = rng.random()
    lang = "en" if r < 0.9 else ("fr", "de", "es")[int((r - 0.9) * 30)]

    paras = []
    for _ in range(rng.randint(1, 20)):
        sents = []
        for _ in range(rng.randint(1, 5)):
            if lang != "en":
                pool = FILLER_NON_EN[lang]
                sents.append(pool[rng.randrange(len(pool))])
            elif rng.random() < 0.7:
                sents.append(_svo_sentence(rng))
            else:
                sents.append(FILLER[rng.randrange(len(FILLER))])
        body = " ".join(sents)
        if rng.random() < 0.2:  # inline formatting coverage
            body = f"<b>{body}</b>"
        paras.append(f"<p>{body}</p>")

    title = f"Report {page_id} &amp; notes"
    html = (
        f"<html><head><title>{title}</title>{_BOILER_STYLE}</head>"
        f"<body>{_BOILER_NAV}<!-- generated page {page_id} -->"
        f"{''.join(paras)}{_BOILER_SCRIPT}{_BOILER_FOOTER}</body></html>"
    )
    return (url, ts, html.encode("utf-8"), "", lang)


def gen_pages_local(n: int, seed: int = SEED) -> list[tuple]:
    """Driver-side generation (tests / oracle comparisons)."""
    return [gen_page(i, seed) for i in range(n)]


def pages_df(spark: SparkSession, n: int, seed: int = SEED) -> DataFrame:
    """Distributed generation: spark.range -> mapInPandas, identical rows
    to ``gen_pages_local`` in any partitioning (order-independent)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_page(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return spark.range(n).mapInPandas(_gen, schema=PAGES_SCHEMA)
