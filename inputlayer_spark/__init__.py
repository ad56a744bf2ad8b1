"""inputlayer_spark — a PySpark-native incremental reasoning engine.

A from-scratch re-architecture of the InputLayer reference engine
(/root/reference: a Rust Datalog engine on Differential Dataflow) onto
Apache Spark: IQL (Datalog) parsing, stratified compilation to DataFrame
logical plans, semi-naive recursive evaluation, vector/temporal/string
builtins as Column expressions, and large-scale data-pipeline operators
(dedup, similarity search, text analysis).

Public surface:
    IQLEngine      — parse + execute IQL programs on a SparkSession
    get_spark      — tuned local SparkSession builder
    functions.*    — vector / temporal / text Column-expression builtins
    operators.*    — dedup / similarity / top-k DataFrame operators
    fluent.*       — proxy-style IQL builder (rule / query / agg / fn)
    olm.*          — typed model classes (Model, Derived, Vector[N])
    migrations.*   — Django-style schema migrations
    integrations.* — agent-graph layer (kg_node / kg_router / memory)
"""

from inputlayer_spark.engine import IQLEngine
from inputlayer_spark.session import get_spark

__all__ = ["IQLEngine", "get_spark"]
__version__ = "0.1.0"
