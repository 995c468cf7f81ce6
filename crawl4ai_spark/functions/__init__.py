"""Scalar function layer: pure-Python canonicalizers (shared by the
pandas UDFs and the reference simulator), native-Column scorer and
filter compilers, and text-analysis expressions."""
