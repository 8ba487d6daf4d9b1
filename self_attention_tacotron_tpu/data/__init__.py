from . import tfrecord, records, dataset

__all__ = ["tfrecord", "records", "dataset"]
