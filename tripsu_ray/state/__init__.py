"""Broadcast helpers, checkpoints/manifests, job metrics."""
