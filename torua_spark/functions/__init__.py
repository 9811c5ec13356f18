from torua_spark.functions.hashing import fnv1a32, shard_for_key  # noqa: F401
