from hawk_pack_spark.queries.catalog import ALL_SPECS, CATALOG, QuerySpec

__all__ = ["ALL_SPECS", "CATALOG", "QuerySpec"]
