"""Named query suites registered into cirro_annotation_spark.registry."""
