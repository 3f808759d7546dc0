from lightning_metastore_spark.plans.queries import RELATIONAL_QUERIES  # noqa: F401
