"""Structured Streaming equivalents of the batch event queries."""
