"""Sources and sinks: GeoJSON ingest, synthetic images table, tile sink."""
