from transporter_spark.plans.pipeline import Pipeline

__all__ = ["Pipeline"]
