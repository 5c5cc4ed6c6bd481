"""dice_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Capabilities mirror embabel/dice (see SURVEY.md): transcript turn assembly,
schema-guided triple extraction, tiered entity linking with candidate blocking,
MinHash-LSH + connected-components canonicalization, graph materialization,
revision/decay/sweep lifecycle, and the KG query surface — all expressed as
DataFrame dataflow so Catalyst/AQE own the physical plan.
"""

__version__ = "0.1.0"
