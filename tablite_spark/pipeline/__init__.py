from tablite_spark.pipeline import (  # noqa: F401
    avi, bpe, dedup, gif, jpeg, multimodal, png, sampling, similarity, text,
)
