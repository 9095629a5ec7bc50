"""Durable engine state: commit manifests, watermarks, lineage."""
