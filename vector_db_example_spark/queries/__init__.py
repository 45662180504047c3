"""Query registry — one entry per implemented operator (SURVEY.md §2).

Each :class:`Query` pairs a Spark implementation ``fn(spark, sf_dir) ->
DataFrame`` with the equivalent ANSI SQL for the DuckDB oracle. The driver
(and ``tests/test_oracle_parity.py``) runs both and compares row count,
schema and an order-insensitive value hash — so every computed column is
aliased identically on both sides and floats are rounded identically.
"""

from __future__ import annotations

from .registry import QUERIES, Query, register  # noqa: F401

# Importing the modules populates the registry.
from . import vector_q  # noqa: E402,F401
from . import relational_q  # noqa: E402,F401
from . import text_q  # noqa: E402,F401
from . import dedup_q  # noqa: E402,F401
from . import events_q  # noqa: E402,F401
from . import pipeline_q  # noqa: E402,F401
from . import index_q  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import multimodal_q  # noqa: E402,F401
