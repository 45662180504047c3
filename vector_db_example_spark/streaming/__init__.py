"""Structured Streaming surface (SURVEY.md §2.9 / §7 M6 extension).

The reference is batch-only — its Milvus backend *internally* treats the
table as a log ("日志即数据", /root/reference/doc/milvus介绍.md:47-52) but
the app never touches streaming APIs. This package is the engine-native
continuous counterpart: file-stream sources over the same tables,
event-time windowed aggregation with watermarks, gap-based session
windows, and a `foreachBatch` embed+append ingestion pipeline mirroring
the reference's batch ingest loop (src/app.py:205-238) as a continuous
job.

Everything here is the SAME logical plan as the batch queries in
`queries/events_q.py` — Structured Streaming's incrementalization is the
only difference, which is exactly how Spark wants streaming expressed.
"""

from .events import (  # noqa: F401
    read_events_stream,
    run_to_memory,
    session_windows,
    windowed_type_counts,
)
from .ingest import stream_ingest_documents  # noqa: F401
