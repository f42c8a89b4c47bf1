"""
Experimental components: implemented and tested, but carrying a measured
NEGATIVE or unvalidated value claim on current hardware. Nothing here is
on any default dispatch path; import explicitly.

- `assoc_kalman`: temporal-parallel (associative-scan) Kalman likelihood.
  Demoted in round 5 — see its module docstring for the measurements.
"""
from .assoc_kalman import msrouse_logL_assoc  # noqa: F401
