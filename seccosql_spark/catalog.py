"""Side catalog: primary-key and statistics metadata Spark has no native slot for.

The reference keeps a full in-memory catalog with per-table primary keys and
statistics (``catalog/interface.scala:99-104``: ``CatalogTable(identifier,
schema, primaryKeys, stats)``) because its PK-FK join reordering rule
(``optimization/rules/mark.scala:83``, ``rules/join.scala:88``) needs to know
which attributes are keys. Spark's catalog tracks neither primary keys nor
exact per-attribute-set cardinalities, so we keep this thin side catalog dict
next to the SparkSession; everything else (schemas, temp views, stats the
optimizer uses) lives in Spark's own catalog.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TableStats:
    """Mirror of the reference's ``Statistics`` (``statsEstimation/Statistics.scala:27-69``):
    row count + size; per-attribute distinct counts and equi-height
    histograms when computed (histogram estimator tier,
    ``statsEstimation/histogram``)."""

    row_count: int | None = None
    size_in_bytes: int | None = None
    ndv: dict[str, int] = field(default_factory=dict)  # column -> approx distinct
    histograms: dict[str, object] = field(default_factory=dict)  # column -> plans.stats.Histogram
    max_freq: dict[str, int] = field(default_factory=dict)  # column -> hottest-value count


@dataclass
class TableMeta:
    name: str
    primary_keys: tuple[str, ...] = ()
    stats: TableStats = field(default_factory=TableStats)


class SideCatalog:
    """Name -> TableMeta. Names are compared case-insensitively, like Spark's."""

    def __init__(self) -> None:
        self._tables: dict[str, TableMeta] = {}

    @staticmethod
    def _key(name: str) -> str:
        return name.lower()

    def register(
        self,
        name: str,
        primary_keys: tuple[str, ...] | list[str] = (),
        stats: TableStats | None = None,
    ) -> TableMeta:
        meta = TableMeta(
            name=name,
            primary_keys=tuple(primary_keys),
            stats=stats or TableStats(),
        )
        self._tables[self._key(name)] = meta
        return meta

    def get(self, name: str) -> TableMeta | None:
        return self._tables.get(self._key(name))

    def primary_keys(self, name: str) -> tuple[str, ...]:
        meta = self.get(name)
        return meta.primary_keys if meta else ()

    def drop(self, name: str) -> None:
        self._tables.pop(self._key(name), None)

    def table_names(self) -> list[str]:
        return [m.name for m in self._tables.values()]
