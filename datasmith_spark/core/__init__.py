"""Pure numpy/python kernels shared by Spark UDFs and the single-process oracle.

Nothing in this subpackage imports pyspark: the same functions run inside
Arrow-batched pandas UDFs on executors and inside the oracle on the driver,
so the pipeline's decisions are identical to the reference labels by
construction (per-row deterministic, float64, stable iteration order).
"""
