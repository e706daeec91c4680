"""Query corpus — importing this package registers every declared query.

Submodules group SURVEY.md §2B families:
* ``relational``  — projection/filter/join/agg/window/sort/setop/scalar/SQL
* ``llm``         — dedup, similarity search, text analysis, multimodal
* ``pipe``        — containerized partition-pipeline ops (MaRe parity)
* ``streaming``   — batch-expressible views of the streaming operators
"""

from mare_spark.queries import (  # noqa: F401
    llm,
    llm2,
    llm3,
    llm4,
    llm5,
    llm6,
    llm7,
    llm8,
    llm9,
    llm10,
    maintenance,
    pipe,
    relational,
    relational2,
    relational3,
    relational4,
    streaming_batch,
    timeseries,
)
