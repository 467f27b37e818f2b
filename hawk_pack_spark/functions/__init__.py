from hawk_pack_spark.functions import distance, text

__all__ = ["distance", "text"]
