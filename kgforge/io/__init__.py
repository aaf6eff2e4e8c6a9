"""Sources and sinks for the triple pipeline."""
