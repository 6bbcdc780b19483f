"""Engine errors. The reference raises DataFusion plan errors for invalid
operator arguments (src/dataframe/sample.rs:28-38); we mirror that with a
dedicated exception type so callers can distinguish validation failures."""


class PlanError(ValueError):
    """Invalid operator arguments detected at plan-construction time."""
