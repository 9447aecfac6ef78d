"""Orchestration runtime: stage-DAG pipeline, checkpoints, scheduling.

Single orchestrator merging the reference's two designs (SURVEY.md §1):
the generic engine/pipeline.py stage DAG (deps, enable/disable, retry,
pause/cancel, events, checkpoints) with restorer.py's production
behavior.
"""

from framewright_tpu.engine.pipeline import (  # noqa: F401
    Pipeline,
    PipelineBuilder,
    PipelineContext,
    Stage,
    StageStatus,
)
from framewright_tpu.engine.checkpoint import CheckpointManager  # noqa: F401
