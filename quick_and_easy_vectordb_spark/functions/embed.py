"""Text-embedding UDFs — the engine's E1 operator (reference parity:
``get_embedding``, /root/reference/app.py:27-37).

Two backends behind one factory:

- ``backend="distilbert"``: exact reference semantics — DistilBERT
  forward pass, truncation at 512 tokens, mean-pool of
  ``last_hidden_state`` over ALL token positions including [CLS]/[SEP]
  (the reference's exact pooling, app.py:37; no attention-mask
  weighting — SURVEY.md §1.4.6). Implemented as an Arrow-batched
  pandas UDF with a per-executor lazy model singleton (the distributed
  analog of the reference's @st.cache_resource, app.py:13). Requires
  torch+transformers at runtime; raises a clear ImportError here where
  they are not installed.
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

__all__ = ["hash_embed_py", "make_embed_udf", "HASH_EMBED_DIM"]

HASH_EMBED_DIM = 8

_MODEL_CACHE: dict[str, object] = {}


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
            outs = []
            with torch.no_grad():
                for t in texts.fillna(""):
                    enc = tok(t, return_tensors="pt", truncation=True,
                              max_length=512, padding=True)
                    hidden = model(**enc).last_hidden_state
                    # mean over ALL positions incl. special tokens —
                    # exact reference pooling (app.py:37)
                    outs.append(hidden.mean(dim=1).squeeze(0).numpy().tolist())
            return pd.Series(outs)

        return embed

    raise ValueError(f"unknown embed backend {backend!r}")
