from .reports import cvd_report, prediabetes_report  # noqa: F401
