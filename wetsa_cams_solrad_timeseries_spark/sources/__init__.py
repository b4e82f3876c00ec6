"""Readers: CAMS expert-CSV, schema'd plain CSV, glob + filename metadata."""
