"""Training pipelines: one jitted train-step per model family plus a thin
driver loop each, reproducing the reference's 9 entry points (SURVEY.md §2.2)
with reference-parity losses, update ratios, schedules, guards, CSV schemas
and checkpoint cadence."""
