"""Per-micro-batch observability (north rule: per-partition lineage +
throughput + state-size metrics logged at every micro-batch).

Spark-side: a ``StreamingQueryListener`` that appends one JSON line per batch
with rows/sec, batch duration, state-store rows/bytes, and source offsets
(the lineage of what each batch consumed). The reference's counterpart is
its named-accumulator dumps (``util/QualityUtils.java:429-442``).
"""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class JsonlMetricsListener(StreamingQueryListener):
    def __init__(self, path: str) -> None:
        self.path = path

    def _write(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "event": "progress",
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_sec": p.inputRowsPerSecond,
            "processed_rows_per_sec": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs) if p.durationMs else {},
            "state_operators": [
                {
                    "rows_total": s.numRowsTotal,
                    "rows_updated": s.numRowsUpdated,
                    "memory_bytes": s.memoryUsedBytes,
                }
                for s in (p.stateOperators or [])
            ],
            "sources": [
                {"description": s.description, "start": s.startOffset, "end": s.endOffset}
                for s in (p.sources or [])
            ],
        }
        self._write(rec)

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event) -> None:  # Spark 3.4+
        pass
