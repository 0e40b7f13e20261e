"""Subpackage placeholder — populated in this build."""
