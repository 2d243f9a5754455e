"""Plan introspection helpers: assert the physical plans we designed for."""

from .audit import audit_plan, plan_report  # noqa: F401
