"""Structured Streaming surface: incremental (Trigger.AvailableNow) scan of
the web_pages table and watermarked event metrics."""
