"""Runtime services: cache, padding, truncation, unicode tables."""
