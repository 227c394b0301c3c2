"""Vectorized sanitize UDFs (the only JVM->Python hop in the pipeline).

Design (SURVEY.md §2.10, §4.1): the whole tree engine is fused into ONE
scalar pandas UDF so each row crosses the Arrow boundary exactly once.
Batches arrive as Arrow string arrays; the per-value work (parse, walk,
serialize) runs in a tight loop over the batch, amortizing settings/regex
setup which lives in module/executor scope. Per-row Python UDFs are never
used (north_rule requirement).

Two shapes:
- ``make_sanitize_udf``   — Series[str] -> Series[str], for the exploded
  span path (scalar pandas_udf; Catalyst sees a deterministic expression).
- ``make_span_array_udf`` — Series[list[struct]] -> Series[list[struct]],
  for the nested zero-extra-shuffle path: sanitizes text-kind spans inside
  the array, passes media spans through byte-identical, preserving order
  trivially.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..configs import settings_for
from ..engine.core import sanitize

__all__ = ["make_sanitize_udf", "make_span_array_udf", "SPAN_TYPE", "SPANS_TYPE"]

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
SPANS_TYPE = T.ArrayType(SPAN_TYPE)


def make_sanitize_udf(settings=None, memoize: int = 0, on_error: str = "raise"):
    """Scalar pandas UDF: sanitize a batch of HTML fragments.

    ``settings`` may be a Settings instance or a registered config name;
    it is captured in the closure and shipped once per executor (the
    broadcast-by-closure pattern, SURVEY.md §1.2).

    ``memoize``: when > 0, keep a per-worker bounded memo of
    input-fragment -> output. Real web corpora repeat boilerplate spans
    (nav bars, footers, templates) at enormous rates, and ``sanitize`` is a
    pure function, so this is a deterministic cache, not an approximation.
    Off by default so benchmarks measure the engine, not the corpus's
    redundancy.

    ``on_error``: poison-document policy for 100TB runs, where one
    pathological fragment must not kill a 10^6-task job.
      - "raise" (default): propagate — correctness runs want loud failures;
      - "keep":  pass the offending fragment through unsanitized (flagged
        by byte-identity downstream);
      - "null":  null the text (drops the content, keeps the span slot).
    """
    if on_error not in ("raise", "keep", "null"):
        raise ValueError(f"on_error must be raise|keep|null, got {on_error!r}")
    settings_obj = settings_for(settings)

    if on_error != "raise":
        keep = on_error == "keep"

        def _safe(t):
            try:
                return sanitize(t, settings_obj)
            except Exception:
                return t if keep else None

        @F.pandas_udf(T.StringType())
        def sanitize_batch_safe(texts: pd.Series) -> pd.Series:
            return pd.Series(
                [_safe(t) if t is not None else None for t in texts],
                dtype="object",
            )

        return sanitize_batch_safe

    if memoize > 0:
        cache_size = memoize

        @F.pandas_udf(T.StringType())
        def sanitize_batch_memo(texts: pd.Series) -> pd.Series:
            cache = _worker_memo.setdefault(id_key, {})
            out = []
            for t in texts:
                if t is None:
                    out.append(None)
                    continue
                hit = cache.get(t)
                if hit is None:
                    hit = sanitize(t, settings_obj)
                    if len(cache) >= cache_size:
                        cache.clear()  # cheap wholesale eviction
                    cache[t] = hit
                out.append(hit)
            return pd.Series(out, dtype="object")

        id_key = id(settings_obj)
        return sanitize_batch_memo

    @F.pandas_udf(T.StringType())
    def sanitize_batch(texts: pd.Series) -> pd.Series:
        # Executor-side: regexes compile lazily once per python worker.
        out = [
            sanitize(t, settings_obj) if t is not None else None for t in texts
        ]
        return pd.Series(out, dtype="object")

    return sanitize_batch


# per-python-worker memo store, keyed by settings identity
_worker_memo: dict = {}


def make_span_array_udf(settings=None):
    """Scalar pandas UDF over the whole ``spans`` array column.

    Keeps documents intact (no explode, no reassembly shuffle): for each
    row, text-kind spans are sanitized in place, media spans pass through
    untouched, order is preserved by construction. Best plan when the doc
    size distribution is tame; the exploded+salted path wins under
    mega-document skew.
    """
    settings_obj = settings_for(settings)

    @F.pandas_udf(SPANS_TYPE)
    def sanitize_spans_batch(spans_col: pd.Series) -> pd.Series:
        def fix(spans):
            if spans is None:
                return None
            out = []
            for s in spans:
                # Arrow hands array<struct> values to pandas as dicts (or
                # Rows); normalize access defensively.
                get = s.get if isinstance(s, dict) else lambda k, _s=s: _s[k]
                kind = get("kind")
                text = get("text")
                if kind == "text" and text is not None:
                    text = sanitize(text, settings_obj)
                out.append(
                    {
                        "kind": kind,
                        "text": text,
                        "media_ref": get("media_ref"),
                        "offset": get("offset"),
                    }
                )
            return out

        return pd.Series([fix(v) for v in spans_col], dtype="object")

    return sanitize_spans_batch
