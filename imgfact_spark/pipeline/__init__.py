from imgfact_spark.pipeline.runner import PipelineConfig, run_pipeline  # noqa: F401
