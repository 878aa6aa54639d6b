"""`cdc_archive_tail` — a real non-file Structured Streaming source.

The reference's CDC source is a gRPC VStream tail: open at a cursor,
receive offset-ordered row batches, checkpoint the cursor
(planetscale_edge_database.go:144-237).  The engine's generic
``source_format`` config (pipeline.py ``_stream_source``) fills that role
with whatever connector the cluster has (Kafka for a live binlog feed) —
but no non-file connector exists in the sandbox, so that branch had never
actually executed.  This module closes the gap with a PySpark **Python
DataSource** (pyspark.sql.datasource, Spark 4): an offset-based streaming
reader that tails an append-only parquet *archive* of the change log —
the "replay a retained binlog from cold storage" shape — with real
checkpointed offsets, partition-parallel reads, and session resume.

Archive contract (Kafka-segment analogue): a flat directory of parquet
files whose **lexicographic name order is commit order** (the
:func:`write_archive` helper names them ``seg-<n>-<i>.parquet`` with a
monotonically increasing ``n`` across append calls and ``i`` numbering
the files within one call).  The stream offset is
``{"file": <abs path>, "row": <rows consumed in that file>}`` — files
strictly before it are fully consumed.  A file, once written, is immutable
(same as a closed log segment); new data only ever arrives as
lexicographically-later files.

Offset protocol (validated against Spark 4.1's microbatch engine):

* ``latestOffset`` reports the **absolute end** of the archive as listed
  right now — Spark's ``availableNow`` trigger snapshots this once and
  drains to it, and a restarted session diff's it against the
  checkpoint's committed offset, so the reader itself holds no
  cross-session state.
* With ``maxEventsPerBatch`` set, ``latestOffset`` caps the advance at
  ``committed + maxEventsPerBatch`` once a batch has committed in this
  session (the pacing analogue of the file source's
  ``maxFilesPerTrigger`` / the reference's 90 s bounded sync sessions,
  planetscale_edge_database.go:89).  The first batch of a session is
  always uncapped (the committed position lives in Spark's checkpoint,
  which the reader cannot see).
* ``partitions(start, end)`` is a pure function of the directory listing
  and the two offsets, so a WAL replay of a planned-but-uncommitted batch
  re-reads byte-identical slices — the engine's exactly-once contract
  needs exactly this determinism.

Two envelopes, selected by the ``envelope`` option:

* ``typed`` (default): Arrow record-batch pass-through of the archive's
  own change-event columns (zero per-row Python; schemas across segments
  are folded with the engine's own add-column/widen rules, so an archive
  that evolved mid-stream self-describes).
* ``value``: each event re-serialized as one JSON line in a single
  ``value`` string column — the Kafka wire shape — driving the engine's
  JVM-side ``from_json`` decode + dead-letter path end-to-end.

Scale note: one task reads one ``(file, row-range)`` slice
(``rowsPerTask`` bounds slice size), so a microbatch fans out across
executors exactly like a file-source batch; the Python-worker cost is
Arrow (de)serialization only.  A live production feed still belongs on a
JVM connector (Kafka); this source is the archived-log replay path and
the proof that the generic ``source_format`` plumbing runs.

Delivery-order contract (chaos-tested, test_sigkill_chaos_pysource_
archive_tail): INTRA-batch row order is scrambled — slices run as
parallel tasks — so the order-independent ``mor`` sink is the honest
match (its read-time LWW resolves (ts, seq) globally).  CROSS-batch
order follows segment commit order (offsets only ever advance through
the lexicographic file sequence, and :func:`write_archive` appends in
commit order), which is the "a key's DELETE arrives no earlier than its
other events" premise the ``cow`` sink needs — holds iff the archive
WRITER emitted segments in commit order.
"""

from __future__ import annotations

import os
import sys
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SOURCE_NAME = "cdc_archive_tail"


def _list_segments(path: str) -> list[str]:
    """Commit-ordered segment files: flat dir, lexicographic names."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(
        os.path.join(path, n)
        for n in names
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )


def _num_rows(f: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f).metadata.num_rows


def _wider_arrow(a, b):
    """Arrow restatement of evolve._wider: int8<int16<int32<int64,
    float32<float64, int*->float* allowed; anything else is an
    incompatibility error (the engine's fail-loudly stance)."""
    import pyarrow as pa

    if a.equals(b):
        return a
    ints = [pa.int8(), pa.int16(), pa.int32(), pa.int64()]
    flts = [pa.float32(), pa.float64()]
    ia = next((i for i, t in enumerate(ints) if t.equals(a)), None)
    ib = next((i for i, t in enumerate(ints) if t.equals(b)), None)
    fa = next((i for i, t in enumerate(flts) if t.equals(a)), None)
    fb = next((i for i, t in enumerate(flts) if t.equals(b)), None)
    if ia is not None and ib is not None:
        return ints[max(ia, ib)]
    if fa is not None and fb is not None:
        return flts[max(fa, fb)]
    if ia is not None and fb is not None:
        return b
    if fa is not None and ib is not None:
        return a
    raise ValueError(f"{SOURCE_NAME}: incompatible segment type change: {a} vs {b}")


def _fold_arrow(current, incoming):
    """evolve.evolve_schema at the Arrow level: current columns (possibly
    widened) + new incoming columns appended nullable."""
    import pyarrow as pa

    by_name = {f.name: f for f in incoming}
    fields = []
    for f in current:
        inc = by_name.pop(f.name, None)
        if inc is None or inc.type.equals(f.type):
            fields.append(f)
            continue
        wide = _wider_arrow(f.type, inc.type)
        fields.append(pa.field(f.name, wide, f.nullable or inc.nullable))
    for name, f in by_name.items():
        fields.append(pa.field(name, f.type, True))
    return pa.schema(fields)


class _Slice(InputPartition):
    """One task's work: rows [start, end) of one segment file."""

    def __init__(self, path: str, start: int, end: int, envelope: str, schema):
        self.path = path
        self.start = start
        self.end = end
        self.envelope = envelope
        self.schema = schema  # target pyarrow schema (typed mode)


class ArchiveStreamReader(DataSourceStreamReader):
    def __init__(self, options, arrow_schema) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError(f"{SOURCE_NAME} needs a 'path' option (archive dir)")
        self.envelope = options.get("envelope", "typed")
        if self.envelope not in ("typed", "value"):
            raise ValueError(f"envelope must be typed|value, got {self.envelope!r}")
        self.per_batch = int(options.get("maxeventsperbatch", 0))
        self.rows_per_task = int(options.get("rowspertask", 1_000_000))
        if self.rows_per_task <= 0:
            raise ValueError("rowsPerTask must be positive")
        self.arrow_schema = arrow_schema
        self._committed: dict | None = None

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"file": "", "row": 0}

    def _advance(self, pos: dict, files: list[str], budget: int) -> dict:
        out = dict(pos)
        for f in files:
            if out["file"] and f < out["file"]:
                continue
            done = out["row"] if f == out["file"] else 0
            avail = _num_rows(f) - done
            if avail <= 0:
                continue
            take = min(avail, budget)
            out = {"file": f, "row": done + take}
            budget -= take
            if budget <= 0:
                break
        return out

    def latestOffset(self) -> dict:
        files = _list_segments(self.path)
        if not files:
            return self._committed or self.initialOffset()
        if self._committed is not None and self.per_batch > 0:
            return self._advance(self._committed, files, self.per_batch)
        return {"file": files[-1], "row": _num_rows(files[-1])}

    def commit(self, end: dict) -> None:
        self._committed = dict(end)

    # -- planning & reading ----------------------------------------------
    def partitions(self, start: dict, end: dict):
        files = _list_segments(self.path)
        out: list[_Slice] = []
        for f in files:
            if (start["file"] and f < start["file"]) or (
                end["file"] and f > end["file"]
            ):
                continue
            n = _num_rows(f)
            lo = start["row"] if f == start["file"] else 0
            hi = end["row"] if f == end["file"] else n
            for s in range(lo, hi, self.rows_per_task):
                out.append(
                    _Slice(
                        f,
                        s,
                        min(s + self.rows_per_task, hi),
                        self.envelope,
                        self.arrow_schema,
                    )
                )
        return out

    def read(self, part: _Slice) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        # read ONLY the row groups overlapping [start, end): splitting one
        # segment into S rowsPerTask slices must not read the file S times
        # (pq.read_table + slice was S-fold read amplification on the path
        # whose purpose is partition-parallel scale); the group row counts
        # come from footer metadata, no data read
        pf = pq.ParquetFile(part.path)
        md = pf.metadata
        groups: list[int] = []
        first_row = acc = 0
        for g in range(md.num_row_groups):
            n = md.row_group(g).num_rows
            if acc + n > part.start and acc < part.end:
                if not groups:
                    first_row = acc
                groups.append(g)
            acc += n
        if not groups:
            return
        t = pf.read_row_groups(groups)
        t = t.slice(part.start - first_row, part.end - part.start)
        if part.envelope == "value":
            # Kafka wire shape: one JSON line per event (vectorized pandas
            # serialization — this envelope exists to drive the engine's
            # from_json decode + DLQ path, not as the throughput path)
            pdf = t.to_pandas()
            # date_unit MUST be "us" (Spark TimestampType precision): the
            # engine's LWW order is (ts, seq), so truncating to whole
            # seconds here could flip LWW winners vs the typed envelope
            # over the same bytes — a genuinely-later sub-second ts would
            # collapse to a tie and lose to commit order.  from_json
            # parses fractional-second ISO timestamps natively.
            lines = pdf.to_json(
                orient="records", lines=True, date_format="iso", date_unit="us"
            )
            vals = lines.splitlines() if lines else []
            yield pa.RecordBatch.from_arrays(
                [pa.array(vals, type=pa.string())], names=["value"]
            )
            return
        # typed pass-through, conformed to the folded declared schema
        # (older segments null-fill added columns; widened types cast)
        target: pa.Schema = part.schema
        cols = []
        for fld in target:
            if fld.name in t.column_names:
                cols.append(t.column(fld.name).cast(fld.type))
            else:
                cols.append(pa.nulls(t.num_rows, type=fld.type))
        conformed = pa.Table.from_arrays(cols, schema=target)
        for b in conformed.to_batches():
            yield b


class ChangelogArchiveDataSource(DataSource):
    """Streaming tail of an append-only parquet changelog archive."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def _arrow_schema(self):
        """Fold every distinct segment footer schema with the engine's
        evolution rules (nullable add-column + safe numeric widen —
        evolve.py's evolve_schema/_wider table, restated here at the Arrow
        level so this module stays import-free in Spark's Python workers;
        pytest pins the two folds equal).  Footer reads are metadata-only;
        dedupe keeps it one fold per distinct schema."""
        files = _list_segments(self.options.get("path") or "")
        if not files:
            raise FileNotFoundError(
                f"{SOURCE_NAME}: no segment files under {self.options.get('path')!r}"
            )
        import pyarrow.parquet as pq

        folded = None
        seen: set[str] = set()
        for f in files:
            s = pq.ParquetFile(f).schema_arrow
            key = str(s)
            if key in seen:
                continue
            seen.add(key)
            folded = s if folded is None else _fold_arrow(folded, s)
        return folded

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        if self.options.get("envelope", "typed") == "value":
            return "value string"
        return from_arrow_schema(self._arrow_schema())

    def streamReader(self, schema) -> ArchiveStreamReader:
        arrow_schema = (
            self._arrow_schema()
            if self.options.get("envelope", "typed") == "typed"
            else None
        )
        return ArchiveStreamReader(self.options, arrow_schema)


def _ship_package(spark) -> None:
    """Make the package importable in Spark's Python workers.

    The DataSource class is cloudpickled BY REFERENCE, so the
    create-data-source / plan / read workers must import
    ``singer_tap_spark`` themselves.  On a cluster that is
    ``spark-submit --py-files`` (job.py's packaging); for local sessions
    launched from a plain checkout we ship the same zip dynamically via
    ``addPyFile`` — identical mechanism, no install step."""
    import tempfile
    import zipfile

    import singer_tap_spark

    root = os.path.dirname(os.path.dirname(os.path.abspath(singer_tap_spark.__file__)))
    pkg = os.path.join(root, "singer_tap_spark")
    # per-process name: a code edit between runs must not hit a stale zip
    zpath = os.path.join(
        tempfile.gettempdir(), f"singer_tap_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for dirpath, _, files in os.walk(pkg):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, root))
        os.replace(tmp, zpath)  # atomic: concurrent sessions see whole zips
    spark.sparkContext.addPyFile(zpath)


def register(spark) -> None:
    """Idempotent registration (latest registration wins in Spark)."""
    _ship_package(spark)
    spark.dataSource.register(ChangelogArchiveDataSource)


def write_archive(df, path: str, *, max_records_per_file: int = 0) -> int:
    """Append one commit's worth of change events to an archive dir as
    monotonically-named immutable segments (``seg-<n>-<i>.parquet``) —
    the closed-log-segment layout the source's offset contract needs.
    Returns the number of segment files written.

    The flat layout doubles as a plain streaming-parquet source dir, so
    equivalence tests can drive BOTH the generic Python source and the
    built-in file source over the *same bytes*."""
    import glob
    import shutil
    import tempfile

    os.makedirs(path, exist_ok=True)
    existing = _list_segments(path)
    nxt = 0
    if existing:
        last = os.path.basename(existing[-1])
        try:
            nxt = int(last.split("-")[1]) + 1
        except (IndexError, ValueError):
            # A foreign .parquet name in the archive would already sort
            # somewhere in commit order the offset contract can't honor
            # (a new seg-<n> that sorts BEFORE it would be permanently
            # skipped once the tail commits past it).  Refuse loudly
            # rather than mint an ambiguous segment.
            raise ValueError(
                f"write_archive: {path!r} contains a non-segment parquet "
                f"file {last!r}; archives must hold only seg-<n>-<i>.parquet"
            ) from None
    tmp = tempfile.mkdtemp(dir=path, prefix="._stage-")
    try:
        w = df.write.mode("overwrite")
        if max_records_per_file > 0:
            w = w.option("maxRecordsPerFile", str(max_records_per_file))
        w.parquet(tmp)
        parts = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))
        for i, p in enumerate(parts):
            os.rename(p, os.path.join(path, f"seg-{nxt:06d}-{i:05d}.parquet"))
        return len(parts)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Pickle this module BY VALUE.  Spark's per-query streaming-source runner
# worker is NOT handed the session's python includes (the create-data-source
# worker is), so a by-reference pickle of these classes cannot unpickle
# there unless the package happens to be importable from the worker's cwd.
# By-value serialization makes the source self-contained; every
# worker-reachable code path above imports only stdlib + pyarrow, and the
# registration re-runs wherever this module is imported (driver or worker),
# so re-pickles stay by-value too.
try:  # pragma: no cover - depends on the vendored cloudpickle version
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001 - fall back to by-reference + shipped zip
    pass
