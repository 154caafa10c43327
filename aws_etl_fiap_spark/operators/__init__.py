"""Operator library: pure ``DataFrame -> DataFrame`` transforms.

Each module mirrors a section of the reference's operator inventory
(SURVEY.md §2) and keeps everything inside Catalyst-optimizable built-in
expressions — no row-at-a-time Python in any hot path.
"""
