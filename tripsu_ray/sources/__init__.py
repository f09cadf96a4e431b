"""Readers/writers and the deterministic source_files synthesizer."""
