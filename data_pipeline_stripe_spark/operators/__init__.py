"""Relational operators Spark has no single primitive for, composed from
DataFrame ops (preference order per the build spec: composition first,
Pandas UDF second, mapPartitions last)."""

from .asof import asof_join

__all__ = ["asof_join"]
