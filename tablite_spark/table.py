"""Table — the user-facing facade mirroring the reference API.

A thin, immutable-ish wrapper around a ``pyspark.sql.DataFrame``. Every
method delegates to the operator modules; the DataFrame (logical plan)
is always accessible as ``.df`` so users can drop to raw Spark.

Reference API surface: tablite/core.py Table methods. This class keeps
the reference's method NAMES and semantics while every implementation
is a declarative Spark plan (lazy until an action), so Catalyst
optimizes across chained calls — unlike the reference, where each call
eagerly materializes pages to disk.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import tablite_spark.operators.filters as _filters
import tablite_spark.operators.groupby as _groupby
import tablite_spark.operators.imputation as _imputation
import tablite_spark.operators.joins as _joins
import tablite_spark.operators.select as _select
import tablite_spark.operators.setops as _setops
import tablite_spark.operators.sorting as _sorting
import tablite_spark.operators.stats as _stats
from tablite_spark.sources import io as _io


class GroupBy(_groupby.GroupBy):
    pass


class Table:
    def __init__(self, df: DataFrame):
        self.df = df

    # ------------------------------------------------------------- io
    @classmethod
    def from_file(cls, spark: SparkSession, path: str, **kwargs) -> "Table":
        return cls(_io.from_file(spark, path, **kwargs))

    @classmethod
    def from_pandas(cls, spark: SparkSession, pdf) -> "Table":
        return cls(_io.from_pandas(spark, pdf))

    @classmethod
    def from_json(cls, spark: SparkSession, jsn) -> "Table":
        return cls(_io.read_json_columnar(spark, jsn))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Table":
        return cls(_io.load(spark, path))

    def save(self, path: str, **kwargs) -> None:
        _io.save(self.df, path, **kwargs)

    def to_csv(self, path: str, **kwargs) -> None:
        _io.to_csv(self.df, path, **kwargs)

    def to_json(self) -> dict:
        return _io.to_json_columnar(self.df)

    def to_pandas(self):
        return _io.to_pandas(self.df)

    def to_sql(self, name: str) -> str:
        return _io.to_sql_script(self.df, name)

    @classmethod
    def from_html(cls, spark: SparkSession, path: str, **kwargs) -> "Table":
        return cls(_io.read_html(spark, path, **kwargs))

    @classmethod
    def from_hdf5(cls, spark: SparkSession, path: str, **kwargs) -> "Table":
        return cls(_io.read_hdf5(spark, path, **kwargs))

    def to_hdf5(self, path: str) -> None:
        _io.to_hdf5(self.df, path)

    def to_xlsx(self, path: str, **kwargs) -> None:
        from tablite_spark.sources.xlsx import to_xlsx
        to_xlsx(self.df, path, **kwargs)

    def to_ods(self, path: str, **kwargs) -> None:
        from tablite_spark.sources.ods import to_ods
        to_ods(self.df, path, **kwargs)

    def to_tsv(self, path: str, **kwargs) -> None:
        _io.to_csv(self.df, path, sep="\t", **kwargs)

    def to_text(self, path: str, **kwargs) -> None:
        _io.to_csv(self.df, path, sep="|", **kwargs)

    def to_html(self, path: str | None = None) -> str:
        return _io.to_html(self.df, path)

    def _repr_html_(self) -> str:
        return _io.to_html(self.df.limit(20))

    # ----------------------------------------------------- dict-like
    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def __len__(self) -> int:
        return self.df.count()

    def __getitem__(self, keys):
        if isinstance(keys, int):
            # t[3] → row tuple (tablite/base.py:1205-1287)
            rows = self.df.offset(keys).limit(1).collect()
            if not rows:
                raise IndexError(keys)
            return tuple(rows[0])
        if isinstance(keys, str):
            return ColumnView(self.df.select(keys), keys)
        if isinstance(keys, slice):
            return Table(_sorting.slice_rows(
                self.df, keys.start, keys.stop, keys.step))
        if isinstance(keys, tuple):
            cols = [k for k in keys if isinstance(k, str)]
            slices = [k for k in keys if isinstance(k, slice)]
            out = self.df.select(*cols) if cols else self.df
            if slices:
                s = slices[0]
                out = _sorting.slice_rows(out, s.start, s.stop, s.step)
            return Table(out)
        raise TypeError(f"unsupported key: {keys!r}")

    def __delitem__(self, name: str):
        self.df = self.df.drop(name)

    _LIST_ASSIGN_LIMIT = 10_000_000

    def __setitem__(self, name: str, value):
        """t['x'] = Column-expression | constant | Table column | list
        (tablite/base.py:1161-1203). List assignment (the reference's
        flagship ``t['A'] = [x*x for x in t['A']]`` idiom,
        README.md:112) is positional: the list is zipped against row
        order via an index join — driver-side data, so it is guarded by
        ``_LIST_ASSIGN_LIMIT``. Prefer Column expressions at scale."""
        if isinstance(value, Table):
            if len(value.df.columns) != 1:
                raise ValueError("assigning a Table requires exactly one column")
            src = value.df.columns[0]
            # The withColumn shortcut resolves `src` against SELF's
            # frame, so it is only valid when `value` provably IS
            # self's own column (t['x'] = t['a']); a foreign table
            # whose column name collides must go positional.
            same_self_col = False
            if src in self.df.columns:
                try:
                    same_self_col = value.df.sameSemantics(self.df.select(src))
                except Exception:
                    same_self_col = False
            if same_self_col:
                self.df = self.df.withColumn(name, F.col(src))
            else:
                base = self.df.drop(name) if name in self.df.columns else self.df
                self.df = _setops.hstack_by_position(
                    base, value.df.withColumnRenamed(src, name))
        elif isinstance(value, F.Column):
            self.df = self.df.withColumn(name, value)
        elif isinstance(value, (list, tuple)):
            if len(value) > self._LIST_ASSIGN_LIMIT:
                raise ValueError(
                    f"list assignment of {len(value)} values exceeds "
                    f"{self._LIST_ASSIGN_LIMIT}; use a Column expression")
            n = self.df.count()
            if len(value) != n:
                raise ValueError(
                    f"length mismatch: {len(value)} values for {n} rows")
            spark = self.df.sparkSession
            col_df = spark.createDataFrame(
                [(i, v) for i, v in enumerate(value)],
                ["__la_idx__", name])
            base = _sorting.with_row_index(
                self.df.drop(name) if name in self.df.columns else self.df,
                "__la_idx__")
            self.df = (base.join(col_df, on="__la_idx__", how="left")
                       .orderBy("__la_idx__").drop("__la_idx__"))
        else:
            self.df = self.df.withColumn(name, F.lit(value))

    @property
    def rows(self):
        """Row iterator (tablite/base.py:1294-1318) — streams partitions
        to the driver via toLocalIterator, never materializing the whole
        table."""
        for r in self.df.toLocalIterator():
            yield tuple(r)

    def remove_all(self, column: str, *values) -> "Table":
        """Column.remove_all as a row filter (tablite/base.py:870-885)."""
        c = F.col(column)
        cond = c.isin([v for v in values if v is not None])
        if any(v is None for v in values):
            cond = cond | c.isNull()
        return Table(self.df.filter(~F.coalesce(cond, F.lit(False))))

    def rename(self, mapping: dict[str, str]) -> "Table":
        return Table(self.df.withColumnsRenamed(mapping))

    def __eq__(self, other) -> bool:
        """Content equality, like the reference's ``t1 == t2``
        (tablite/base.py) — NOTE this runs two Spark jobs. ``__hash__``
        stays identity-based so Tables remain usable in sets/dicts
        without triggering jobs."""
        if not isinstance(other, Table):
            return NotImplemented
        return _setops.frames_equal(self.df, other.df)

    __hash__ = object.__hash__

    def __add__(self, other: "Table") -> "Table":
        return Table(_setops.concat(self.df, other.df))

    def __iadd__(self, other: "Table") -> "Table":
        self.df = _setops.concat(self.df, other.df)
        return self

    def __mul__(self, n: int) -> "Table":
        return Table(_setops.repeat(self.df, n))

    def stack(self, other: "Table") -> "Table":
        return Table(_setops.stack(self.df, other.df))

    def copy(self) -> "Table":
        return Table(self.df)  # lineage IS the zero-copy page share

    def show(self, *a, **kw):
        return self.df.show(*a, **kw)

    # ------------------------------------------- construction surface
    def add_columns(self, *names: str) -> "Table":
        """tablite ``add_columns`` (base.py:1618-1621): new all-null
        columns."""
        for n in names:
            self.df = self.df.withColumn(n, F.lit(None).cast("string"))
        return self

    def add_column(self, name: str, data=None) -> "Table":
        """``add_column`` (base.py:1623-1638): a constant or Column
        expression; per-row python lists don't distribute — use
        ``from_pandas`` for literal data."""
        if isinstance(data, F.Column) or data is None:
            self.df = self.df.withColumn(
                name, data if data is not None
                else F.lit(None).cast("string"))
        else:
            self.df = self.df.withColumn(name, F.lit(data))
        return self

    def add_rows(self, *rows) -> "Table":
        """``add_rows`` (base.py:1539-1616): append literal rows (tuples
        or dicts keyed by column)."""
        spark = self.df.sparkSession
        as_tuples = []
        for r in rows:
            if isinstance(r, dict):
                as_tuples.append(tuple(r.get(c) for c in self.df.columns))
            else:
                as_tuples.append(tuple(r))
        new = spark.createDataFrame(as_tuples, schema=self.df.schema)
        self.df = self.df.unionByName(new)
        return self

    def clear(self) -> "Table":
        """``clear`` (base.py:1346-1348): drop all rows, keep schema."""
        self.df = self.df.limit(0)
        return self

    def items(self):
        """``items`` (base.py:1151-1156): (name, values) pairs —
        driver-side by definition; stream via rows for big tables."""
        cols = self.df.columns
        data = {c: [] for c in cols}
        for r in self.rows:
            for c, v in zip(cols, r):
                data[c].append(v)
        return data.items()

    def nbytes(self) -> int:
        """Approximate in-plan size (reference reports page bytes,
        base.py:1134-1149); here: Catalyst's logical size estimate."""
        return int(self.df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())

    # ------------------------------------------------------- filters
    def filter(self, expressions, filter_type: str = "all") -> tuple["Table", "Table"]:
        t, f = _filters.filter_pass_fail(self.df, expressions, filter_type)
        return Table(t), Table(f)

    def expression(self, expression: str, namespace: dict | None = None) -> "Table":
        """Filter by a string expression — SQL fast path, python-AST
        pandas-UDF fallback for python-only syntax (incl. user
        functions passed via ``namespace``)."""
        return Table(self.df.filter(
            _filters.mask_from_string(expression, self.df, namespace)))

    def any(self, **criteria) -> "Table":
        return Table(_filters.any_all(self.df, criteria, "any"))

    def all(self, **criteria) -> "Table":
        return Table(_filters.any_all(self.df, criteria, "all"))

    def drop(self, *values) -> "Table":
        return Table(_filters.drop_rows_with(self.df, *values))

    def replace(self, mapping: dict, columns: list[str] | None = None) -> "Table":
        return Table(_filters.replace_values(self.df, mapping, columns))

    def drop_duplicates(self, *columns: str) -> "Table":
        return Table(_filters.drop_duplicates(self.df, *columns))

    def merge(self, left: str, right: str, new: str, criteria) -> "Table":
        """SQL CASE merge (tablite/core.py:660-702, tablite/merge.py:7-50)."""
        crit = criteria if not isinstance(criteria, str) else _filters.mask_from_string(criteria)
        out = (self.df.withColumn(
            new, F.when(crit, F.col(left)).otherwise(F.col(right)))
            .drop(*{left, right} - {new}))
        return Table(out)

    # --------------------------------------------------------- joins
    def join(self, other: "Table", left_keys, right_keys,
             left_columns=None, right_columns=None, kind: str = "inner",
             merge_keys: bool = False) -> "Table":
        return Table(_joins.join(self.df, other.df, left_keys, right_keys,
                                 left_columns, right_columns, kind, merge_keys))

    def inner_join(self, other, left_keys, right_keys, **kw) -> "Table":
        return self.join(other, left_keys, right_keys, kind="inner", **kw)

    def left_join(self, other, left_keys, right_keys, **kw) -> "Table":
        return self.join(other, left_keys, right_keys, kind="left", **kw)

    def outer_join(self, other, left_keys, right_keys, **kw) -> "Table":
        return self.join(other, left_keys, right_keys, kind="outer", **kw)

    def cross_join(self, other, **kw) -> "Table":
        return self.join(other, None, None, kind="cross", **kw)

    def asof_join(self, other: "Table", on: str, by=None,
                  direction: str = "backward", right_cols=None) -> "Table":
        """Nearest-in-time match (the reference's lookup-with-inequality
        bus-timetable pattern) — scalable union+carry, no join node."""
        return Table(_joins.asof_join(self.df, other.df, on, by,
                                      direction, right_cols))

    def range_join(self, other: "Table", value_col: str, lo_col: str,
                   hi_col: str, by=None, bin_width=None) -> "Table":
        """Value-in-interval join (the reference's lookup with two
        inequalities) — binned equi join, never a nested loop."""
        return Table(_joins.range_join(self.df, other.df, value_col,
                                       lo_col, hi_col, by, bin_width))

    def lookup(self, other: "Table", *criteria, all: bool = True) -> "Table":
        return Table(_joins.lookup(self.df, other.df, *criteria, all=all))

    def match(self, other: "Table", *criteria, keep_left=None, keep_right=None) -> "Table":
        keys = [(lc, rc) for lc, op, rc in criteria]
        return Table(_joins.match(self.df, other.df, keys, keep_left, keep_right))

    # ------------------------------------------------------- groupby
    def groupby(self, keys: list[str], functions=None) -> "Table":
        return Table(_groupby.groupby(self.df, keys, functions))

    def pivot(self, rows, columns, functions, values_as_rows: bool = False) -> "Table":
        return Table(_groupby.pivot(self.df, rows, columns, functions, values_as_rows))

    def transpose(self) -> "Table":
        return Table(_groupby.transpose(self.df))

    def pivot_transpose(self, columns, keep=None, column_name: str = "transpose",
                        value_name: str = "value") -> "Table":
        return Table(_groupby.melt(self.df, ids=keep or [], values=columns,
                                   variable_name=column_name, value_name=value_name))

    # ---------------------------------------------------------- sort
    def sort(self, mapping: dict[str, bool], sort_mode: str = "excel",
             mixed_columns=None, collation: str | None = None) -> "Table":
        return Table(_sorting.sort(self.df, mapping, sort_mode,
                                   mixed_columns, collation=collation))

    def sorted(self, mapping: dict[str, bool], sort_mode: str = "excel",
               mixed_columns=None, collation: str | None = None) -> "Table":
        """Reference alias (tablite/core.py:425-432): sort returning a
        new table — identical here, where sort never mutates."""
        return self.sort(mapping, sort_mode, mixed_columns, collation)

    def sort_index(self, mapping: dict[str, bool],
                   sort_mode: str = "excel") -> "Table":
        """``sort_index`` (tablite/core.py:366-373): the permutation —
        one (position, original_row_id) pair per row."""
        rid = "__si_rid__"
        tagged = _sorting.with_row_index(self.df, rid)
        s = _sorting.sort(tagged, mapping, sort_mode)
        return Table(s.select(F.col(rid).alias("row_id")))

    def is_sorted(self, mapping: dict[str, bool], sort_mode: str = "excel") -> bool:
        return _sorting.is_sorted(self.df, mapping, sort_mode)

    def reindex(self, index: list[int], order_by=None) -> "Table":
        return Table(_sorting.reindex(self.df, index, order_by))

    def unique_index(self, *keys: str, order_by=None) -> "Table":
        return Table(_sorting.unique_index(self.df, list(keys), order_by))

    def index(self, *keys: str) -> "Table":
        """{key_tuple: [row_ids]} (tablite/base.py:1927-1965)."""
        tagged = _sorting.with_row_index(self.df, "__row_id__")
        return Table(tagged.groupBy(*keys).agg(
            F.collect_list("__row_id__").alias("row_ids")))

    # --------------------------------------------------------- misc
    def column_select(self, cols: list[dict]) -> tuple["Table", "Table"]:
        p, f = _select.column_select(self.df, cols)
        return Table(p), Table(f)

    def replace_missing_values(self, *args, **kwargs):
        """Reference parity (tablite/core.py:854): points at imputation."""
        raise AttributeError("See imputation")

    def imputation(self, targets, missing=None, method: str = "carry_forward",
                   sources=None, order_by=None) -> "Table":
        return Table(_imputation.imputation(self.df, targets, method,
                                            sources, order_by, missing=missing))

    def diff(self, other: "Table", columns=None) -> "Table":
        return Table(_setops.table_diff(self.df, other.df, columns))

    def statistics(self, column: str) -> dict:
        return _stats.statistics_dict(self.df, column)

    def histogram(self, column: str) -> "Table":
        return Table(_stats.histogram(self.df, column))

    def unique(self, column: str) -> "Table":
        return Table(_stats.unique_values(self.df, column))

    def count(self, column: str, value) -> int:
        return _stats.count_value(self.df, column, value)

    def types(self) -> dict:
        return _stats.type_census(self.df)


class ColumnView(Table):
    """Single-column view returned by ``t['a']`` — the reference's
    Column-object surface (tablite/base.py Column): ``t['a'].
    statistics()``, ``.unique()``, ``.histogram()``, ``.count(v)``,
    ``.remove_all(*values)``, iteration over values. It IS a Table
    (one column), so every Table operation still applies."""

    def __init__(self, df: DataFrame, name: str):
        super().__init__(df)
        self._name = name

    @property
    def name(self) -> str:
        return self._name

    def statistics(self) -> dict:
        return _stats.statistics_dict(self.df, self._name)

    def unique(self) -> "Table":
        return Table(_stats.unique_values(self.df, self._name))

    def histogram(self) -> "Table":
        return Table(_stats.histogram(self.df, self._name))

    def count(self, value) -> int:
        return _stats.count_value(self.df, self._name, value)

    def remove_all(self, *values) -> "Table":
        return Table.remove_all(self, self._name, *values)

    def __iter__(self):
        for r in self.df.toLocalIterator():
            yield r[self._name]

    def to_list(self) -> list:
        return [r[self._name] for r in self.df.toLocalIterator()]
