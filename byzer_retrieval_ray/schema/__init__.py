from byzer_retrieval_ray.schema.dsl import (  # noqa: F401
    ArrayType,
    MapType,
    SingleType,
    StructField,
    StructType,
    parse_schema,
    to_arrow_schema,
)
