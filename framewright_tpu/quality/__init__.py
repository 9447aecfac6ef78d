"""Quality validation, metrics, and reporting."""

from framewright_tpu.quality.validators import (  # noqa: F401
    QualityReport,
    QualityValidator,
)
