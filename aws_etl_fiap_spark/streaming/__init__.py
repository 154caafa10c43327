"""Structured Streaming layer: the reference's S3-event trigger (S9) and the
event-window operators, streaming-native."""
