"""Public API facade — populated as subsystems land (placeholder for now)."""


class LDiffusionModel:  # pragma: no cover - replaced by the real facade
    def __init__(self, *a, **k):
        raise NotImplementedError("api facade lands after trainers")
