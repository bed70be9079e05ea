"""Source readers (SURVEY.md §2.1 S1-S4, S6).

The reference reads Excel with pandas/openpyxl
(/root/reference/dags/etl_pipeline.py:70), JSON arrays with pd.read_json
(:92) and re-reads its own /tmp CSV hand-offs with inferred types (:117,
:169, :227, :248). Spark-first mapping:

- Parquet is the primary format (columnar, predicate-pushdown, statistics).
- CSV/JSON are read with *explicit* schemas: schema inference is a full
  extra pass over 100 TB, and the reference's type-loss-per-stage problem
  (SURVEY.md §1.2) disappears when types are declared once at ingest.
- Excel has no distributed JVM reader in this environment, so it is a
  documented driver-bounded source: pandas reads the workbook, Arrow ships
  it to the JVM. Fine for config-sized workbooks; anything bigger should
  land as CSV/Parquet first.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schemas for the driver-provided test tables (TESTDATA.md); on a
# real deployment these would come from the catalog. Parquet carries its own
# schema so these double as documentation + assertion material.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as TIMESTAMP(NANOS) in parquet; Spark 4 can't read those
# natively, so the session reads them as int64 nanos
# (spark.sql.legacy.parquet.nanosAsLong) and this reader normalizes to
# microsecond timestamps — floor truncation, matching DuckDB's ns handling.
_NANOS_TS_COLUMNS = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table from a scale-factor directory as parquet."""
    ns_cols = _NANOS_TS_COLUMNS.get(name, ())
    if ns_cols:
        # set defensively: the driver's session may not have it yet
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in ns_cols:
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    # Parquet writers vary in whether they mark timestamps adjusted-to-UTC;
    # unmarked ones arrive as TIMESTAMP_NTZ, which half the timestamp
    # builtins (unix_micros, to_utc_timestamp, ...) reject. The session
    # timezone is pinned to UTC, so casting NTZ -> TIMESTAMP is a pure
    # type-level normalization: same wall-clock instant, one column type
    # for every downstream operator regardless of which writer produced
    # the file.
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the named tables and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan (S4). Explicit schema preferred; inference only as fallback
    (it costs an extra full pass at scale)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_orc(
    spark: SparkSession,
    path: str,
    *,
    merge_schema: bool = False,
    **options: str,
) -> DataFrame:
    """ORC scan: the other columnar lake format (Hive-ecosystem hand-off).
    Same pushdown/pruning posture as parquet — predicate pushdown and
    column pruning reach the ORC reader, and vectorized decoding is on by
    default (spark.sql.orc.enableVectorizedReader)."""
    reader = spark.read.option("mergeSchema", str(merge_schema).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Multimodal ingestion scan: every file under ``path`` as one row of
    (path, modificationTime, length, content binary) via Spark's
    binaryFile source — the entry point that feeds multimodal.binary_ops
    (decode/resize run downstream as Arrow-batched mapInPandas over the
    ``content`` column).

    Scale posture: the source splits by FILE (a file never splits), and
    spark.sql.files.maxPartitionBytes bounds how many files coalesce into
    one task — so partitions stay payload-sized without manual tuning.
    Filters on path/length/modificationTime push down to the listing
    (never reading file bodies); pair with a length ceiling to keep one
    giant artifact from skewing a task."""
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", str(recursive).lower()
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    multi_line: bool = True,
    **options: str,
) -> DataFrame:
    """JSON scan (S2): array-of-records files need multiLine=true, one JSON
    object per line (JSONL — the scalable layout) sets multi_line=False."""
    reader = spark.read.option("multiLine", str(multi_line).lower())
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


_XLSX_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_XLSX_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_XLSX_DOCREL = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


def _xlsx_col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'B3' -> 1, 'AA7' -> 26 (0-based column index)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


# Built-in OOXML number formats that render as dates/times (ECMA-376
# §18.8.30); custom formats are classified by their format code.
_XLSX_BUILTIN_DATE_FMTS = frozenset(
    list(range(14, 23)) + list(range(27, 37)) + list(range(45, 48)) + list(range(50, 59))
)


def _xlsx_fmt_is_date(code: str) -> bool:
    """True when a custom number-format code renders as a date/time: it
    contains y/m/d/h/s tokens outside quoted literals and [] sections."""
    import re

    stripped = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code)
    return bool(re.search(r"[ymdhs]", stripped, re.IGNORECASE))


def _xlsx_date_styles(z: "object") -> frozenset[int]:
    """Style (xf) indexes whose number format is a date/time, from
    xl/styles.xml — the ``s`` attribute on a numeric cell points here."""
    import xml.etree.ElementTree as ET

    if "xl/styles.xml" not in z.namelist():
        return frozenset()
    M = _XLSX_MAIN_NS
    root = ET.fromstring(z.read("xl/styles.xml"))
    custom_date = {
        int(nf.get("numFmtId"))
        for nfs in root.findall(f"{M}numFmts")
        for nf in nfs.findall(f"{M}numFmt")
        if _xlsx_fmt_is_date(nf.get("formatCode", ""))
    }
    date_fmt_ids = _XLSX_BUILTIN_DATE_FMTS | custom_date
    xfs = root.find(f"{M}cellXfs")
    if xfs is None:
        return frozenset()
    return frozenset(
        i
        for i, xf in enumerate(xfs.findall(f"{M}xf"))
        if int(xf.get("numFmtId", "0")) in date_fmt_ids
    )


def _xlsx_serial_to_datetime(serial: float) -> "object":
    """Excel day serial -> datetime (1899-12-30 epoch, the convention
    openpyxl/pandas use for post-Feb-1900 dates)."""
    import datetime as dt

    return dt.datetime(1899, 12, 30) + dt.timedelta(days=serial)


def _read_xlsx_stdlib(
    path: str, sheet_name: int | str = 0
) -> tuple[list[str], list[list]]:
    """Parse an .xlsx with ONLY the stdlib (zipfile + ElementTree).

    An xlsx is a zip of XML parts; this reads the workbook's sheet list,
    resolves the requested sheet through the relationship table, inflates
    shared strings, and returns (header, rows) with numbers as int/float,
    't="b"' cells as bool, and missing cells as None. Covers the cell
    types pandas would produce for a config-sized workbook — the fallback
    when openpyxl isn't installed (the reference's own engine,
    /root/reference/dags/etl_pipeline.py:70).
    """
    import xml.etree.ElementTree as ET
    import zipfile

    M, R = _XLSX_MAIN_NS, _XLSX_REL_NS
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{M}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{M}t")))

        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = wb.find(f"{M}sheets").findall(f"{M}sheet")
        if isinstance(sheet_name, int):
            sheet = sheets[sheet_name]
        else:
            matches = [s for s in sheets if s.get("name") == sheet_name]
            if not matches:
                raise ValueError(f"no sheet named {sheet_name!r} in {path}")
            sheet = matches[0]
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target = {
            r.get("Id"): r.get("Target")
            for r in rels.findall(f"{R}Relationship")
        }[sheet.get(_XLSX_DOCREL)]
        sheet_part = target if target.startswith("xl/") else f"xl/{target}"

        date_styles = _xlsx_date_styles(z)
        grid: list[list] = []
        for row in ET.fromstring(z.read(sheet_part)).iter(f"{M}row"):
            cells: dict[int, object] = {}
            prev_ci = -1
            for c in row.findall(f"{M}c"):
                ref = c.get("r")
                # a missing r attribute is legal OOXML: the cell's
                # position is then implied sequential after the previous
                # cell in the row
                ci = _xlsx_col_index(ref) if ref else prev_ci + 1
                prev_ci = ci
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{M}is")
                    val: object = (
                        "".join(t.text or "" for t in is_el.iter(f"{M}t"))
                        if is_el is not None
                        else None
                    )
                else:
                    v = c.find(f"{M}v")
                    raw = v.text if v is not None else None
                    if raw is None:
                        val = None
                    elif ctype == "s":
                        val = shared[int(raw)]
                    elif ctype == "b":
                        val = raw == "1"
                    elif ctype == "str":
                        val = raw
                    else:  # numeric
                        f = float(raw)
                        if int(c.get("s", "-1")) in date_styles:
                            # date-styled serial -> datetime, matching
                            # what the openpyxl engine would return
                            val = _xlsx_serial_to_datetime(f)
                        else:
                            val = int(f) if f.is_integer() else f
                cells[ci] = val
            width = max(cells) + 1 if cells else 0
            grid.append([cells.get(i) for i in range(width)])

    if not grid:
        return [], []
    width = max(len(r) for r in grid)
    grid = [r + [None] * (width - len(r)) for r in grid]
    header = [
        str(h) if h is not None else f"col{i}" for i, h in enumerate(grid[0])
    ]
    return header, grid[1:]


def read_excel(
    spark: SparkSession, path: str, sheet_name: int | str = 0
) -> DataFrame:
    """Excel scan (S1) — driver-bounded by design.

    The reference does pd.read_excel on one VM
    (/root/reference/dags/etl_pipeline.py:70); there is no scalable xlsx
    reader without an external package, so this reads on the driver and
    ships to executors via Arrow. Documented limit: workbook must fit in
    driver memory. Everything downstream is distributed.

    Engine: pandas/openpyxl when installed; otherwise a stdlib
    zipfile+ElementTree parser (xlsx is just zipped XML) so the source
    works in minimal environments too.
    """
    import pandas as pd  # local import keeps pandas off the module path

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError:  # openpyxl absent -> stdlib parse
        header, rows = _read_xlsx_stdlib(path, sheet_name)
        pdf = pd.DataFrame(rows, columns=header)
    # Arrow conversion chokes on mixed object columns; stringify them.
    for col in pdf.columns:
        if pdf[col].dtype == object:
            pdf[col] = pdf[col].astype("string")
    return spark.createDataFrame(pdf)


try:  # Spark 4 Python DataSource API
    from pyspark.sql.datasource import DataSource as _DS
    from pyspark.sql.datasource import DataSourceReader as _DSR
    from pyspark.sql.datasource import InputPartition as _IP

    class XlsxDataSource(_DS):
        """Spark 4 Python DataSource: ``spark.read.format("xlsx")`` with
        EXECUTOR-SIDE parsing — the scalable form of the reference's S1
        Excel scan (`read_excel` above stays as the documented
        driver-bounded single-workbook path).

        The realistic "Excel at 100 TB" shape is MANY workbooks, not one
        giant one: ``load(dir)`` lists the .xlsx files (driver lists
        names only) and emits one input partition per (file, sheet), so a
        thousand workbooks parse on a thousand cores, each through the
        stdlib zipfile+ElementTree parser (`_read_xlsx_stdlib`) on the
        executor. All columns surface as strings (None preserved) — the
        honest contract for spreadsheet data; the coercion layer
        (functions/coercion.py, reference P5-P7) owns typing, exactly as
        the reference sniff-then-coerce flow does.

        Options: ``sheet`` (index or name, default 0). Provide a schema
        via ``.schema(...)`` to skip inference (inference parses the
        first file's header on the driver).
        """

        @classmethod
        def name(cls) -> str:
            return "xlsx"

        def _files(self) -> list[str]:
            import os

            path = self.options.get("path")
            if path is None:
                raise ValueError("xlsx source requires a path")
            if os.path.isdir(path):
                files = sorted(
                    os.path.join(path, f)
                    for f in os.listdir(path)
                    if f.endswith(".xlsx")
                )
                if not files:
                    raise ValueError(f"no .xlsx files under {path}")
                return files
            return [path]

        def _sheet(self):
            s = self.options.get("sheet", "0")
            return int(s) if s.lstrip("-").isdigit() else s

        def schema(self):
            from pyspark.sql import types as T

            header, _rows = _read_xlsx_stdlib(
                self._files()[0], self._sheet()
            )
            return T.StructType(
                [T.StructField(h, T.StringType()) for h in header]
            )

        def reader(self, schema):
            return _XlsxReader(self._files(), self._sheet(), schema)

    class _XlsxReader(_DSR):
        def __init__(self, files, sheet, schema):
            self.files = files
            self.sheet = sheet
            self.names = [f.name for f in schema.fields]

        def partitions(self):
            return [_IP((f, self.sheet)) for f in self.files]

        def read(self, partition):
            path, sheet = partition.value
            header, rows = _read_xlsx_stdlib(path, sheet)
            idx = {h: i for i, h in enumerate(header)}
            for row in rows:
                yield tuple(
                    (
                        None
                        if idx.get(n) is None or row[idx[n]] is None
                        else str(row[idx[n]])
                    )
                    for n in self.names
                )

    def register_xlsx_source(spark: SparkSession) -> None:
        """Idempotent registration of the xlsx Python DataSource."""
        spark.dataSource.register(XlsxDataSource)

except ImportError:  # pragma: no cover - Spark < 4

    def register_xlsx_source(spark: SparkSession) -> None:
        raise NotImplementedError(
            "the xlsx DataSource needs the Spark 4 Python DataSource "
            "API; use read_excel (driver-bounded) instead"
        )
