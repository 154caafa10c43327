"""End-to-end pipeline plans (the reference's EP1/EP2/EP3 lifecycles,
SURVEY.md §3) expressed as composable in-process Spark stages."""
