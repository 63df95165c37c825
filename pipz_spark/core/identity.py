"""Operator identity metadata.

Spark-native analog of the reference's ``Identity`` struct
(reference: api.go:371-386): every processor/connector carries a
name + description that appears in error paths and the exported plan
tree. We use the operator *name* (stable, human-readable) as the path
element rather than a per-instance UUID — the plan is static per
pipeline, so names are sufficient for correlation and keep error
columns deterministic (oracle-hashable).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Identity:
    """Name + description attached to every Step."""

    name: str
    description: str = ""
    id: str = field(default_factory=lambda: str(uuid.uuid4()), compare=False)

    def __post_init__(self) -> None:
        if not self.name:
            raise ValueError("Identity.name must be non-empty")
