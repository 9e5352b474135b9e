from sparf_tpu.datasets.registry import create_dataset, dataset_dict  # noqa: F401
