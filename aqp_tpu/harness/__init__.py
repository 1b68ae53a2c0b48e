from aqp_tpu.harness.runner import ExperimentConfig, run_experiments, rows_to_csv

__all__ = ["ExperimentConfig", "run_experiments", "rows_to_csv"]
