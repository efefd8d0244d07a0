"""Custom Python data sink for append-only report lines (S4,
`my_dag.py:240-243`) through the Spark 4 Python Data Source WRITER API.

The reference appends report lines with a bare ``open(..., 'a')`` — no
atomicity, no failure story. This connector re-expresses that sink with
the mechanics a distributed sink actually needs (the same ones
parquet's commit protocol provides, re-created for a plain
directory-of-text layout):

- **Task-side writes, driver-side commit**: each partition's
  ``write(iterator)`` streams its rows to a part file (written under a
  dot-prefixed in-progress name, renamed only when the task finishes)
  and returns a commit message ``(filename, n_rows)``; the driver's
  ``commit(messages)`` publishes the job by writing ``manifest.json``
  — every part with its row count — and a ``_SUCCESS`` marker. A
  manifest-honoring reader never sees a torn write: a task that died
  mid-file left only an unreferenced ``.inprogress`` name.
- **Append accumulation**: a later append job MERGES its parts into
  the existing manifest (the reference's one-line-per-run report
  semantics), so the manifest is always the complete committed view.
- **Job-scoped abort**: Spark's Python batch write calls ``abort()``
  with ``None`` messages (task commit messages only reach
  ``commit()``), so cleanup cannot rely on them. Every job embeds a
  driver-generated job id in its filenames and ``abort()`` removes
  exactly ``part-<job_id>-*`` — files from PRIOR committed appends are
  untouched, and a failed job leaves the directory exactly as it
  found it.

Like the reader connector (solver_out.py), the classes are built by a
factory so they pickle BY VALUE to executor workers — no PYTHONPATH
assumption. Local-filesystem paths are the demo surface; on a cluster
the ``path`` option must point at storage every node mounts (the same
contract as the multimodal fixtures, SCALE.md).
"""

from __future__ import annotations


FORMAT_NAME = "reportsink"


def make_report_sink_datasource():
    """Build the sink class (closure-defined for by-value pickling)."""
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclass
    class ReportCommit(WriterCommitMessage):
        filename: str
        n_rows: int

    class ReportSinkWriter(DataSourceWriter):
        """Writes the single string column ``value`` line-per-row."""

        def __init__(self, options, overwrite):
            import uuid

            self.path = options.get("path")
            if not self.path:
                raise ValueError("reportsink requires option 'path'")
            self.overwrite = overwrite
            # generated ON THE DRIVER, serialized to every task: names
            # this job's files so abort() can clean them without
            # commit messages (which Spark hands to abort as None)
            self.job_id = uuid.uuid4().hex[:12]

        def write(self, iterator):
            import os

            from pyspark import TaskContext

            ctx = TaskContext.get()
            name = f"part-{self.job_id}-{ctx.partitionId():05d}.txt"
            n = 0
            # dot-prefixed until the task finishes its file; visible to
            # readers only when the job's manifest references it
            tmp = os.path.join(self.path, f".{name}.attempt{ctx.attemptNumber()}")
            with open(tmp, "w", encoding="utf-8") as f:
                for row in iterator:
                    f.write(row.value + "\n")
                    n += 1
            os.rename(tmp, os.path.join(self.path, name))
            return ReportCommit(filename=name, n_rows=n)

        def _manifest_path(self):
            import os

            return os.path.join(self.path, "manifest.json")

        def commit(self, messages):
            import json
            import os

            new_parts = sorted(
                (
                    {"file": m.filename, "rows": m.n_rows}
                    for m in messages
                    if m is not None
                ),
                key=lambda d: d["file"],
            )
            parts = []
            if os.path.exists(self._manifest_path()):  # append job: merge
                with open(self._manifest_path(), "r", encoding="utf-8") as f:
                    parts = json.load(f)["parts"]
            parts = parts + new_parts
            manifest = {
                "parts": parts,
                "total_rows": sum(p["rows"] for p in parts),
            }
            tmp = os.path.join(self.path, f".manifest.json.{self.job_id}")
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(manifest, f)
            os.rename(tmp, self._manifest_path())
            with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
                f.write("")

        def abort(self, messages):
            import glob
            import os

            doomed = glob.glob(
                os.path.join(self.path, f"part-{self.job_id}-*")
            ) + glob.glob(os.path.join(self.path, f".part-{self.job_id}-*"))
            for p in doomed:
                try:
                    os.remove(p)
                except OSError:
                    pass

    class ReportSinkDataSource(DataSource):
        @classmethod
        def name(cls):
            return FORMAT_NAME

        def writer(self, schema, overwrite):
            cols = [f.name for f in schema.fields]
            if cols != ["value"]:
                raise ValueError(
                    f"reportsink expects a single 'value' string column, got {cols}"
                )
            return ReportSinkWriter(self.options, overwrite)

    return ReportSinkDataSource


STREAM_FORMAT_NAME = "reportsink_stream"


def make_report_stream_sink_datasource():
    """Build the STREAMING sink class (Spark 4 ``DataSourceStreamWriter``
    — the streaming half of the Python Data Source writer API; classes
    closure-defined for by-value pickling, as in the batch sink above).

    Per micro-batch: each partition's ``write(iterator)`` streams its
    rows to a part file under a dot-prefixed in-progress name, renamed
    only when the task finishes, and returns ``(filename, n_rows)``;
    the driver's ``commit(messages, batchId)`` publishes the batch by
    atomically renaming ``manifest-<batchId>.json`` into place. The
    EXACTLY-ONCE story rides the manifest, not the files: a replayed
    batch (post-crash re-run of the same batchId) writes fresh part
    files but OVERWRITES that batchId's manifest, and a
    manifest-honoring reader reads only manifest-referenced parts — so
    duplicates from replays are never visible, which is precisely the
    idempotent-per-batchId contract Structured Streaming requires of a
    sink. ``abort(messages, batchId)`` removes exactly the named parts
    of the failed batch; committed batches are untouched.

    Local-filesystem paths are the demo surface; on a cluster ``path``
    must be storage every node mounts (same contract as the batch
    sink).
    """
    import json
    import os
    import uuid
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    @dataclass
    class BatchPartCommit(WriterCommitMessage):
        filename: str
        n_rows: int

    class ReportStreamWriter(DataSourceStreamWriter):
        """Writes the single string column ``value`` line-per-row."""

        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError(
                    f"{STREAM_FORMAT_NAME} sink requires option 'path'"
                )

        def write(self, iterator):
            os.makedirs(self.path, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.txt"
            tmp = os.path.join(self.path, f".{name}.inprogress")
            n = 0
            with open(tmp, "w") as fh:
                for row in iterator:
                    fh.write(str(row[0]) + "\n")
                    n += 1
            os.rename(tmp, os.path.join(self.path, name))
            return BatchPartCommit(filename=name, n_rows=n)

        def commit(self, messages, batchId):
            # A zero-partition micro-batch (e.g. an empty availableNow
            # replay) reaches commit() without any executor-side
            # write() having created the directory.
            os.makedirs(self.path, exist_ok=True)
            manifest = {
                "batch_id": batchId,
                "parts": [
                    {"file": m.filename, "n_rows": m.n_rows}
                    for m in messages
                    if m is not None
                ],
            }
            tmp = os.path.join(
                self.path, f".manifest-{batchId}.inprogress"
            )
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            # atomic publish; a replayed batchId overwrites its own
            # manifest, never another batch's
            os.replace(
                tmp, os.path.join(self.path, f"manifest-{batchId}.json")
            )

        def abort(self, messages, batchId):
            for m in messages or []:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.filename))
                    except OSError:
                        pass
            # A task that died mid-write never produced a commit
            # message; its dot-prefixed temp file is invisible to
            # manifest readers but would accumulate under repeated
            # failures/replays. Part files rename atomically on
            # success, so any .part-*.inprogress left at abort time
            # is garbage from this or an earlier failed attempt.
            try:
                for fn in os.listdir(self.path):
                    if fn.startswith(".part-") and fn.endswith(
                        ".inprogress"
                    ):
                        try:
                            os.remove(os.path.join(self.path, fn))
                        except OSError:
                            pass
            except OSError:
                pass

    class ReportStreamSinkDataSource(DataSource):
        @classmethod
        def name(cls):
            return STREAM_FORMAT_NAME

        def streamWriter(self, schema, overwrite):
            return ReportStreamWriter(self.options)

    return ReportStreamSinkDataSource
