"""Event-time windowing (batch + Structured Streaming).

The reference is strictly batch (SURVEY §2.9); these are the
streaming-semantics extensions a Spark-native replacement provides.
"""
