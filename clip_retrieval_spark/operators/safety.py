"""Content-safety filters — the reference's NSFW / violence post-filters
(clip_back.py:315-324: MLP score > 0.5 drop; einsum against a prompt
matrix, argmax==1 drop) restated for batch corpora.

The classifier weights are STUBBED deterministically (no model libs in
this container; the real deployment loads an ONNX/torch MLP once per
Python worker, exactly the init-once seam marked below). What is real:
the broadcast of the prompt matrix, the Arrow-batched scoring, and the
filter semantics.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clip_retrieval_spark.functions.vectors import dot


def _stub_mlp_score(emb_matrix: np.ndarray) -> np.ndarray:
    """STUB safety MLP: deterministic pseudo-score in [0,1). Real impl:
    the reference's 4-layer MLP (h14_nsfw_model.py:10-50)."""
    w = np.frombuffer(
        hashlib.blake2b(b"safety-w", digest_size=64).digest(), dtype=np.uint8
    ).astype(np.float64)
    w = (w - 127.5) / 1024.0
    k = min(emb_matrix.shape[1], w.shape[0])
    raw = emb_matrix[:, :k] @ w[:k]
    return 1.0 / (1.0 + np.exp(-raw * 4.0))


def score_safety(
    df: DataFrame, emb_col: str = "embedding", out_col: str = "safety_score"
) -> DataFrame:
    """Append a safety score per row (Arrow-batched; model loaded once
    per worker — the predict_batch_udf shape)."""
    cols = df.columns

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # real model would be constructed HERE, once per worker
        for pdf in batches:
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            ) if len(pdf) else np.zeros((0, 1))
            out = pdf.copy()
            out[out_col] = _stub_mlp_score(m).astype(np.float32)
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} float"
    return df.mapInPandas(_go, schema=schema).select(*cols, out_col)


def safety_filter(
    df: DataFrame, threshold: float = 0.5, emb_col: str = "embedding"
) -> DataFrame:
    """Drop rows scoring above threshold (the reference drops score>0.5,
    clip_back.py:318-319)."""
    scored = score_safety(df, emb_col)
    return scored.filter(F.col("safety_score") <= threshold).drop(
        "safety_score"
    )


def prompt_filter(
    df: DataFrame,
    prompts: list[list[float]],
    emb_col: str = "embedding",
    drop_index: int = 1,
) -> DataFrame:
    """Prompt-matrix argmax filter (the violence-detector shape,
    clip_back.py:321-324): score each row against every prompt vector
    JVM-side (prompt matrix as literal arrays — effectively broadcast),
    drop rows whose argmax is ``drop_index``."""
    scores = [
        dot(F.col(emb_col), F.array(*[F.lit(float(x)) for x in p]))
        for p in prompts
    ]
    arr = F.array(*scores)
    argmax = F.array_position(arr, F.array_max(arr)) - 1
    return (
        df.withColumn("_amax", argmax)
        .filter(F.col("_amax") != drop_index)
        .drop("_amax")
    )
