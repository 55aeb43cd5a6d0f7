"""Deterministic fixture generators (FIXTURES.md F1-F5).

Pure functions of (seed, size): byte-identical inputs at local[2] and
local[32]. Generation happens driver-side in plain python (sizes are test
scale; the bench generator parallelizes the same recipe via mapInPandas).

Models the reference's bibliographic Clean-Clean datasets
(``/root/reference/README.md:73-84``, D4 DBLP-ACM) and the synthetic
Dirty-ER scalability sets (``README.md:88-96``).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .datamodel import DOCS_SCHEMA

_FIRST = [
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael", "linda",
    "david", "elizabeth", "william", "barbara", "richard", "susan", "joseph", "jessica",
    "thomas", "sarah", "charles", "karen", "wei", "li", "ana", "carlos", "yuki", "omar",
]
_LAST = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller", "davis",
    "rodriguez", "martinez", "hernandez", "lopez", "gonzalez", "wilson", "anderson",
    "thomas", "taylor", "moore", "jackson", "martin", "chen", "wang", "kumar", "sato",
]
_TITLE_VOCAB = [
    "efficient", "scalable", "distributed", "adaptive", "incremental", "parallel",
    "approximate", "optimal", "robust", "streaming", "entity", "resolution",
    "blocking", "filtering", "indexing", "query", "processing", "join", "similarity",
    "clustering", "deduplication", "records", "databases", "graphs", "learning",
    "models", "analysis", "evaluation", "benchmark", "framework", "systems", "methods",
    "algorithms", "techniques", "optimization", "integration", "linkage", "matching",
    "semantic", "schema", "knowledge", "extraction", "discovery", "mining", "search",
    "retrieval", "ranking", "sampling", "estimation", "compression", "partitioning",
    "workloads", "pipelines", "storage", "caching", "transactions", "consistency",
    "replication", "sharding", "vectors", "embeddings", "hashing", "sketches",
]
_VENUES = [
    "vldb", "sigmod", "icde", "edbt", "cikm", "kdd", "www", "wsdm", "sigir", "cidr",
    "pods", "socc", "icdm", "sdm", "ecml", "pkdd", "acl", "emnlp", "neurips", "icml",
]


@dataclass
class CleanCleanCorpus:
    docs: DataFrame          # canonical interleaved docs (both sources, doc_id 'A:i'/'B:j')
    gold_pairs: DataFrame    # (left_id from A, right_id from B)


def _make_entity(rng: random.Random, eid: int) -> dict:
    title = rng.sample(_TITLE_VOCAB, rng.randint(5, 9))
    n_auth = rng.randint(1, 4)
    authors = [f"{rng.choice(_FIRST)} {rng.choice(_LAST)}" for _ in range(n_auth)]
    return {
        "eid": eid,
        "title": title,
        "authors": authors,
        "venue": rng.choice(_VENUES),
        "year": str(rng.randint(1995, 2024)),
        "n_media": rng.randint(0, 2),
    }


def _spans_for(rng: random.Random, ent: dict, corrupt: bool) -> list:
    title = list(ent["title"])
    authors = [a for a in ent["authors"]]
    if corrupt:
        # token drop/swap in title (seeded), abbreviation of author first names
        if len(title) > 5 and rng.random() < 0.6:
            title.pop(rng.randrange(len(title)))
        if len(title) > 2 and rng.random() < 0.4:
            i = rng.randrange(len(title) - 1)
            title[i], title[i + 1] = title[i + 1], title[i]
        authors = [
            (f"{a.split()[0][0]} {a.split()[1]}" if rng.random() < 0.5 else a) for a in authors
        ]
    spans = []
    off = 0
    spans.append(("title", " ".join(title), None, off)); off += 1
    for j in range(ent["n_media"]):
        spans.append(("media", None, f"ref://img/{ent['eid']}_{j}", off)); off += 1
    spans.append(("authors", ", ".join(authors), None, off)); off += 1
    spans.append(("venue", ent["venue"], None, off)); off += 1
    spans.append(("year", ent["year"], None, off)); off += 1
    return spans


def clean_clean_corpus(
    spark: SparkSession,
    n_entities: int = 500,
    match_rate: float = 0.85,
    distractor_rate: float = 0.10,
    seed: int = 42,
) -> CleanCleanCorpus:
    """F1/F2: DBLP-ACM-style two-source corpus with planted duplicates.

    Source A: one doc per entity. Source B: corrupted doc for ~match_rate of
    entities (-> gold pairs) plus ~distractor_rate unmatched docs.
    """
    rng = random.Random(seed)
    rows, gold = [], []
    n_distract = int(n_entities * distractor_rate)
    for eid in range(n_entities):
        ent = _make_entity(rng, eid)
        a_id = f"A:{eid:06d}"
        rows.append((a_id, _spans_for(rng, ent, corrupt=False)))
        if rng.random() < match_rate:
            b_id = f"B:{eid:06d}"
            rows.append((b_id, _spans_for(rng, ent, corrupt=True)))
            gold.append((a_id, b_id))
    for d in range(n_distract):
        ent = _make_entity(rng, n_entities + d)
        rows.append((f"B:d{d:06d}", _spans_for(rng, ent, corrupt=False)))
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    gold_df = spark.createDataFrame(gold, "left_id string, right_id string")
    return CleanCleanCorpus(docs=docs, gold_pairs=gold_df)


@dataclass
class DirtyCorpus:
    docs: DataFrame
    gold_pairs: DataFrame  # unordered within one source, left_id < right_id


def dirty_corpus(
    spark: SparkSession, n_entities: int = 300, seed: int = 42
) -> DirtyCorpus:
    """F3: single-source Dirty-ER corpus; each entity emitted 1-4 times
    (seeded geometric-ish), all emissions mutually duplicate."""
    rng = random.Random(seed)
    rows, gold = [], []
    for eid in range(n_entities):
        ent = _make_entity(rng, eid)
        n_copies = 1
        while n_copies < 4 and rng.random() < 0.45:
            n_copies += 1
        ids = []
        for c in range(n_copies):
            did = f"D:{eid:06d}:{c}"
            ids.append(did)
            rows.append((did, _spans_for(rng, ent, corrupt=(c > 0))))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                gold.append((ids[i], ids[j]))
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    gold_df = spark.createDataFrame(gold, "left_id string, right_id string")
    return DirtyCorpus(docs=docs, gold_pairs=gold_df)


def distributed_dirty_docs(
    spark: SparkSession,
    n_entities: int,
    seed: int = 42,
    partitions: int = 64,
    vocab_multiplier: int = 997,
    rare_token_rate: float = 0.8,
) -> DataFrame:
    """Scale-bench generator: the Dirty-ER recipe of ``dirty_corpus`` run
    data-parallel via ``mapInPandas`` so corpora of 10^5-10^6 docs generate in
    executor time, not driver time. Deterministic per (seed, eid) — every
    entity draws from its own ``random.Random(seed * P + eid)``, so the output
    is identical at any parallelism/partitioning (north-rule determinism).

    Models the reference's synthetic Dirty scalability sets
    (``/root/reference/README.md:88-96``, 10K-2M entities) with a **Zipf-like
    vocabulary**: ``rare_token_rate`` of each title's tokens are suffixed into
    a ``62 * vocab_multiplier`` rare-token space (the discriminative long tail
    blocking relies on at corpus scale), the rest stay in the tiny head
    vocabulary (the stop-word-like mega-blocks that purging must kill). With
    the raw 62-word vocabulary every block has ~n/62 members and the pair
    space is quadratic regardless of blocking — a degenerate workload no real
    corpus resembles.
    """
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for eid in pdf["id"]:
                eid = int(eid)
                rng = random.Random(seed * 1_000_003 + eid)
                ent = _make_entity(rng, eid)
                ent["title"] = [
                    f"{t}{rng.randrange(vocab_multiplier)}"
                    if rng.random() < rare_token_rate
                    else t
                    for t in ent["title"]
                ]
                # name space likewise: ~26*200 first / 24*200 last names —
                # 650 distinct name tokens at 10^5 docs would make every
                # name block a mega-block, which no real corpus has
                ent["authors"] = [
                    f"{a.split()[0]}{rng.randrange(200)} {a.split()[1]}{rng.randrange(200)}"
                    for a in ent["authors"]
                ]
                n_copies = 1
                while n_copies < 4 and rng.random() < 0.45:
                    n_copies += 1
                for c in range(n_copies):
                    spans = [
                        {"kind": k, "text": t, "media_ref": m, "offset": o}
                        for (k, t, m, o) in _spans_for(rng, ent, corrupt=(c > 0))
                    ]
                    rows.append({"doc_id": f"D:{eid:08d}:{c}", "spans": spans})
            yield pd.DataFrame(rows)

    return spark.range(n_entities).repartition(partitions).mapInPandas(gen, DOCS_SCHEMA)


def vector_corpus(
    spark: SparkSession,
    n_entities: int = 200,
    dim: int = 32,
    match_rate: float = 0.8,
    seed: int = 42,
):
    """F4: seeded unit vectors with planted near-duplicate structure:
    matching pairs within cosine >= ~0.9, rest isotropic."""
    rng = random.Random(seed)

    def unit(v):
        n = sum(x * x for x in v) ** 0.5
        return [x / n for x in v]

    rows, gold = [], []
    for eid in range(n_entities):
        base = unit([rng.gauss(0, 1) for _ in range(dim)])
        a_id = f"A:{eid:06d}"
        rows.append((a_id, [float(x) for x in base]))
        if rng.random() < match_rate:
            noise = [rng.gauss(0, 0.15) for _ in range(dim)]
            pert = unit([b + n for b, n in zip(base, noise)])
            b_id = f"B:{eid:06d}"
            rows.append((b_id, [float(x) for x in pert]))
            gold.append((a_id, b_id))
    vecs = spark.createDataFrame(rows, "doc_id string, vec array<double>")
    gold_df = spark.createDataFrame(gold, "left_id string, right_id string")
    return vecs, gold_df
