"""Pandas UDAF (grouped-aggregate pandas_udf) — the UDAF leg of the
declared UDF/UDAF/UDTF surface (SURVEY.md §2.2).

Reserved for aggregations built-ins can't express; geometric mean is the
canonical example (no built-in; log-sum-exp needs per-group numpy).
Arrow-batched: each group's column arrives as one pandas Series — the
~10-100x-over-row-UDF path.  At 100 TB the same function runs unchanged;
groups stream through executors partition-wise (one shuffle on the keys,
no partial aggregation though — a Pandas UDAF sees whole groups, so
prefer built-in combinations when partial agg matters more than
expressiveness).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geometric_mean_udaf(v: pd.Series) -> float:
    """exp(mean(log(x))) over positive values; NaN-safe."""
    x = v.to_numpy(dtype="float64")
    x = x[x > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x).mean()))
