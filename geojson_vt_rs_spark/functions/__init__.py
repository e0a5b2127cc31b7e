"""Pure Column-expression helpers (JVM-side, no Python UDFs).

Each helper has a twin SQL string generator so the DuckDB oracle can run
the byte-identical formula — that is the engine's correctness gate for
SQL-expressible operators.
"""
