"""Plan-inspection utilities."""

from kinesis_customer_sample_spark.plans.audit import PlanFacts, audit, plan_text  # noqa: F401
