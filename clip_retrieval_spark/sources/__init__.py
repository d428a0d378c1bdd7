"""Sources/sinks: folder scans, modality pairing, table helpers."""
