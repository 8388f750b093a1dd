"""Column-expression helpers (cosine similarity, hashing, text metrics).

Everything here returns Spark ``Column`` expressions built from
``pyspark.sql.functions`` so they stay JVM-side / codegen'd; Pandas UDFs
appear only where built-ins genuinely can't express the semantics.
"""
