"""Plan-construction layer — deliberately thin.

SURVEY.md §4's conclusion: nothing in the reference's surface needs a
custom Catalyst rule or physical strategy. Every optimization the
reference hand-codes (column pruning, predicate/limit pushdown,
vectorized scan, batching, partial aggregation) is Catalyst/Tungsten
built-in once the query is expressed declaratively — so the engine's
"planner" is just the driver-side *query construction* that turns index
metadata into prunable predicates before Catalyst sees the plan:

* IVF nprobe  → ``index.ivf.nearest_cells``  → ``cell_id IN (...)``
  partition filter on the cell-partitioned layout (pruning = nprobe).
* LSH multiprobe → ``index.lsh.probe_buckets`` → ``bucket IN (...)``.

Both are re-exported here as the plan-construction API. The physical
plans this produces are pinned by tests/test_plans.py (broadcast dims,
pushed filters, TakeOrderedAndProject top-k, partition pruning, partial
aggregation, no Python in JVM-expressible paths).
"""

from ..index.ivf import nearest_cells  # noqa: F401
from ..index.lsh import probe_buckets  # noqa: F401

__all__ = ["nearest_cells", "probe_buckets"]
