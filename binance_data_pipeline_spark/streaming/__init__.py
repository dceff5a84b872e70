"""Structured Streaming: ingest (WS→Kafka→bronze path, §3.1) and windowed
analytics (OHLCV/VWAP bars, session windows — ST6 extensions).
"""
