"""Text-embedding UDFs — the engine's E1 operator (reference parity:
``get_embedding``, /root/reference/app.py:27-37).

Two backends behind one factory:

- ``backend="distilbert"``: exact reference semantics — DistilBERT
  forward pass, truncation at 512 tokens, mean-pool of
  ``last_hidden_state`` over ALL token positions including [CLS]/[SEP]
  (the reference's exact pooling, app.py:37; no attention-mask
  weighting of *content* tokens — SURVEY.md §1.4.6). Implemented as an
  Arrow-batched pandas UDF with a per-executor lazy model singleton
  (the distributed analog of the reference's @st.cache_resource,
  app.py:13). Texts are length-bucketed and run as PADDED BATCHES with
  a mask-weighted mean — mathematically identical to the reference's
  per-text all-positions mean, because for each text the mask==1
  positions are exactly its unpadded positions (specials included):
  ``(hidden·mask).sum(L) / mask.sum(L) == hidden[:len].mean(L)``.
  This restores GPU/batch throughput that a per-text loop throws away,
  without changing the pooling semantics. Requires torch+transformers
  at runtime; raises a clear ImportError here where they are not
  installed.
- ``backend="hash"`` (default): a deterministic, dependency-free
  stand-in with the same UDF plumbing — element i of the vector is
  ``int(md5(f"{text}:{i}")[:8], 16) / 2^32`` ∈ [0, 1). Fully
  reproducible across engines, so even the UDF path is oracle-checkable
  in ANSI SQL.

Either way the hot path is a pandas UDF: Arrow batches across the
Python boundary, vectorized work per batch, model loaded once per
worker — never a row-at-a-time Python UDF.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "hash_embed_py",
    "make_embed_udf",
    "masked_mean_np",
    "length_buckets",
    "HASH_EMBED_DIM",
    "EMBED_BATCH_SIZE",
]

HASH_EMBED_DIM = 8
EMBED_BATCH_SIZE = 32

_MODEL_CACHE: dict[str, object] = {}


def masked_mean_np(hidden, mask):
    """Mask-weighted mean pooling, numpy reference: ``hidden`` (B, L, H)
    padded hidden states, ``mask`` (B, L) 0/1 attention mask →
    (B, H). For every row this equals the mean over that row's unpadded
    positions (specials included) — i.e. the reference's per-text
    all-positions pooling (app.py:37) — because mask==1 selects exactly
    those positions. Shared by the torch path (same expression on
    tensors) and the parity unit test (torch-free)."""
    m = mask[:, :, None].astype(hidden.dtype)
    return (hidden * m).sum(axis=1) / m.sum(axis=1)


def length_buckets(lengths: list[int], batch_size: int) -> list[list[int]]:
    """Group indices into batches of at most ``batch_size``, ordered by
    sequence length, so each padded batch wastes minimal compute on pad
    positions (the classic length-bucketing schedule). Deterministic:
    ties break on index."""
    order = sorted(range(len(lengths)), key=lambda i: (lengths[i], i))
    return [
        order[i : i + batch_size] for i in range(0, len(order), batch_size)
    ]


def hash_embed_py(text: str, dim: int = HASH_EMBED_DIM) -> list[float]:
    """Driver-side reference implementation of the hash backend (used
    to build literal query vectors and oracle SQL)."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{text}:{i}".encode()).hexdigest()
        out.append(int(h[:8], 16) / 4294967296.0)
    return out


def make_embed_udf(backend: str = "hash", dim: int = HASH_EMBED_DIM) -> Column:
    """Build a Series→Series pandas UDF ``text -> array<double>``."""
    if backend == "hash":

        @pandas_udf(T.ArrayType(T.DoubleType()))
        def embed(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: hash_embed_py(t if t is not None else "", dim)
            )

        return embed

    if backend == "distilbert":

        @pandas_udf(T.ArrayType(T.DoubleType()))
        def embed(texts: pd.Series) -> pd.Series:
            try:
                import torch  # noqa: PLC0415
                from transformers import AutoModel, AutoTokenizer  # noqa: PLC0415
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError(
                    "backend='distilbert' needs torch+transformers (not "
                    "installed in this container); use backend='hash' for "
                    "the deterministic stand-in"
                ) from e
            if "model" not in _MODEL_CACHE:  # once per executor worker
                _MODEL_CACHE["tok"] = AutoTokenizer.from_pretrained(
                    "distilbert-base-uncased"
                )
                _MODEL_CACHE["model"] = AutoModel.from_pretrained(
                    "distilbert-base-uncased"
                ).eval()
            tok, model = _MODEL_CACHE["tok"], _MODEL_CACHE["model"]
            clean = list(texts.fillna(""))
            # tokenize once (no padding), then length-bucket and run
            # padded batches; mask-weighted mean == per-text mean over
            # all unpadded positions (see module docstring)
            enc = tok(clean, truncation=True, max_length=512)
            lens = [len(ids) for ids in enc["input_ids"]]
            outs: list[list[float] | None] = [None] * len(clean)
            with torch.no_grad():
                for bucket in length_buckets(lens, EMBED_BATCH_SIZE):
                    batch = tok.pad(
                        {k: [enc[k][i] for i in bucket] for k in enc},
                        return_tensors="pt",
                    )
                    hidden = model(**batch).last_hidden_state
                    mask = batch["attention_mask"].unsqueeze(-1).to(hidden.dtype)
                    pooled = (hidden * mask).sum(dim=1) / mask.sum(dim=1)
                    for j, i in enumerate(bucket):
                        outs[i] = pooled[j].numpy().tolist()
            return pd.Series(outs)

        return embed

    raise ValueError(f"unknown embed backend {backend!r}")
