"""Data layer: `info.json` scene datasets, frame selection, padded batching."""
