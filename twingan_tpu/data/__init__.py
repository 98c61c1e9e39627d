"""Data layer: TFRecord codec, tf.Example wire codec, dataset registry,
converters, device-side preprocessing, and the input pipeline.

Reference parity map (SURVEY.md section 2.4):
- tfrecord.py   <- TFRecord container format (TF's C++ runtime in the
                   reference; here the native/ C++ library + Python codec)
- example.py    <- tf.train.Example proto wire format (protobuf runtime in
                   the reference)
- datasets.py   <- datasets/dataset_factory.py + per-dataset get_split modules
- converters.py <- datasets/convert_general_image_data.py family
- preprocess.py <- preprocessing/danbooru_preprocessing.py + preprocessing_util.py
- pipeline.py   <- slim DatasetDataProvider + prefetch queue + the synthetic
                   speed-test source (model_inheritor.py:786-843)
"""

from twingan_tpu.data.tfrecord import TFRecordReader, TFRecordWriter, crc32c, masked_crc32c
from twingan_tpu.data.example import Example, encode_example, decode_example
from twingan_tpu.data.datasets import DATASETS, get_dataset
