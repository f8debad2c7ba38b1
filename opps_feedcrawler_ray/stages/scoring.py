"""Model-inference stage shape: a stateful scorer as an actor-pool
``map_batches`` CLASS — weights load ONCE per actor in ``__init__`` (the
slot where a real deployment deserializes a classifier checkpoint),
``__call__`` scores each Arrow batch vectorized.

The model itself is an INTEGER linear model over the engine's frozen
quality features, so (unlike a float network) the score is bit-exact and
the whole inference stage carries a DuckDB oracle — the plumbing
(actor-pool lifecycle, batch shape, zero-copy Arrow I/O) is identical to
what a real model stage needs; only the kernel is trivially exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# fixed published "checkpoint": integer weights + decision threshold
QUALITY_WEIGHTS = {"n_chars": 1, "n_punct": -20, "n_stop": 5, "n_tokens": 3}
QUALITY_THRESHOLD = 380
_STOPWORDS = frozenset(
    ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")
)


class QualityScorer:
    """Callable class for ``map_batches(QualityScorer, concurrency=N)``."""

    def __init__(self) -> None:
        # "model load": done once per actor process, never per batch
        self.w = dict(QUALITY_WEIGHTS)
        self.threshold = QUALITY_THRESHOLD
        self.stop = _STOPWORDS

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        n_chars = np.empty(n, dtype=np.int64)
        n_punct = np.empty(n, dtype=np.int64)
        n_stop = np.empty(n, dtype=np.int64)
        n_tokens = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            t = t or ""
            n_chars[i] = len(t)
            n_punct[i] = sum(1 for ch in t if ch in ".!?,;:")
            toks = t.split()
            n_tokens[i] = len(toks)
            n_stop[i] = sum(1 for w in t.lower().split() if w in self.stop)
        score = (
            self.w["n_chars"] * n_chars
            + self.w["n_punct"] * n_punct
            + self.w["n_stop"] * n_stop
            + self.w["n_tokens"] * n_tokens
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "score": pa.array(score),
                "keep": pa.array(score >= self.threshold),
            }
        )
