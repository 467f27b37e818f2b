from hawk_pack_spark.queries.catalog import CATALOG, QuerySpec

__all__ = ["CATALOG", "QuerySpec"]
