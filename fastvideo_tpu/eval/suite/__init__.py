"""Built-in metric classes for the class-based eval suite.

Modules here register metrics with fastvideo_tpu.eval.registry on import
(the registry's ``load_builtin_metrics`` imports them lazily so ``import
fastvideo_tpu`` stays fast).
"""
