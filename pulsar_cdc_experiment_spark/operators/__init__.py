"""Engine operators: pure DataFrame → DataFrame functions.

Every operator here works identically on batch (``spark.read``) and
streaming (``spark.readStream``) DataFrames unless documented otherwise —
the Structured Streaming unified model makes the batch path the correctness
oracle for the streaming path.
"""
