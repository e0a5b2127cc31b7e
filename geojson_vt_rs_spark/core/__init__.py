"""Pure numpy geometry kernels on a flat-array feature encoding.

These functions are deliberately Spark-free: they run identically on the
driver (unit tests, tiny inputs) and inside Arrow-batched pandas UDFs on
executors.  Semantics follow the reference implementation exactly
(citations in each module point at /root/reference/src/*.rs); the
*representation* (flat xs/ys/zs + offset arrays instead of nested vectors)
is our own, chosen to round-trip losslessly through Arrow.
"""
