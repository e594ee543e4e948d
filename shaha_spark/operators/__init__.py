"""Training-data pipeline operators.

Import submodules explicitly (``from shaha_spark.operators import
dedup``): this package init stays empty on purpose — eager submodule
imports here create a cycle with shaha_spark.functions.text, which
pulls operators.constants while dedup (pulled by this init) is pulling
functions.text back.
"""
