"""Scalar/table function surface (SURVEY.md §2.2 "Scalar functions",
"UDF/UDAF/UDTF").

Scalar functions are deliberately NOT wrapped: the engine's contract is
that `pyspark.sql.functions` built-ins ARE the scalar surface (JVM-side,
codegen) — wrapping them would only hide the plan.  Declared queries
exercise them directly (Q22 string/date/math/JSON, Q23 arrays).

This module holds what built-ins can't express: Python UDTFs (table
functions) and the registration helper.
"""

from .udtf import ParseSelector, register_udtfs

__all__ = ["ParseSelector", "register_udtfs"]

from .udaf import geometric_mean_udaf  # noqa: E402

__all__.append("geometric_mean_udaf")
