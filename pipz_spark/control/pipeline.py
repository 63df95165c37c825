"""Pipeline wrapper — run-ID correlation (pipeline.go:33-56).

Wraps a root Step with a stable pipeline UUID and injects a fresh
execution UUID per run (pipeline.go:52-56), propagated as the Spark
job group + local properties so every job/stage/task of the run is
attributable in the UI and logs — the distributed analog of the
reference's ctx-embedded IDs (extractors pipeline.go:84-100).
"""

from __future__ import annotations

import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from ..core.step import Step
from . import signals as S


class Pipeline:
    def __init__(self, name: str, root: Step, bus: S.SignalBus = S.BUS) -> None:
        self.name = name
        self.root = root
        self.pipeline_id = str(uuid.uuid4())
        self._bus = bus
        self.last_execution_id: str | None = None

    @contextmanager
    def attributed(self, spark: SparkSession, execution_id: str | None = None):
        """Scope the driver thread's job group / local properties to
        this pipeline, restoring the caller's PRIOR attribution on
        exit (nesting-safe). ``run`` uses it
        internally; callers who want their TERMINAL action (collect /
        write — Spark jobs fire at action time, not compose time)
        attributed to a run can wrap it:

            with pipe.attributed(spark, pipe.last_execution_id):
                out.write.parquet(...)
        """
        execution_id = execution_id or str(uuid.uuid4())
        sc = spark.sparkContext
        # save-and-restore rather than clear: a caller (or an OUTER
        # attributed() block) may have its own job group set, and
        # clearing on exit would strand its later actions unattributed
        # and unreachable by its cancelJobGroup (r7 review finding).
        # Job groups are thread-local properties underneath, so
        # restoring the property values restores the exact prior
        # attribution, including nesting.
        saved = {
            p: sc.getLocalProperty(p)
            for p in (
                "spark.jobGroup.id",
                "spark.job.description",
                "spark.job.interruptOnCancel",
                "pipz.pipeline.id",
                "pipz.execution.id",
            )
        }
        sc.setJobGroup(f"pipz:{self.name}:{execution_id}", f"pipz pipeline {self.name}")
        sc.setLocalProperty("pipz.pipeline.id", self.pipeline_id)
        sc.setLocalProperty("pipz.execution.id", execution_id)
        try:
            yield execution_id
        finally:
            # without this, every later action on the same driver
            # thread is attributed to the last pipeline run — and a
            # stray cancelJobGroup on that id would cancel them
            for prop, value in saved.items():
                sc.setLocalProperty(prop, value)

    def run(self, spark: SparkSession, df: DataFrame) -> DataFrame:
        execution_id = str(uuid.uuid4())
        self.last_execution_id = execution_id
        with self.attributed(spark, execution_id):
            self._bus.emit(
                S.PIPELINE_STARTED,
                name=self.name,
                pipeline_id=self.pipeline_id,
                execution_id=execution_id,
            )
            out = self.root.apply(df, ())
            self._bus.emit(
                S.PIPELINE_COMPLETED,
                name=self.name,
                pipeline_id=self.pipeline_id,
                execution_id=execution_id,
            )
            return out

    def to_node(self) -> dict:
        return {
            "name": self.name,
            "type": "pipeline",
            "pipeline_id": self.pipeline_id,
            "children": [self.root.to_node()],
        }
