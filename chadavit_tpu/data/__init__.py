from chadavit_tpu.data.datasets import (  # noqa: F401
    DATASETS,
    CsvManifestDataset,
    DatasetWithIndex,
    SyntheticChannels,
    dataset_with_index,
    load_channel_stack,
    prepare_datasets,
)
from chadavit_tpu.data.pipeline import (  # noqa: F401
    HostLoader,
    dense_collate,
    device_prefetch,
    one_channel_flatten,
    prepare_dataloader,
)
from chadavit_tpu.data.transforms import (  # noqa: F401
    AugmentationPipeline,
    FullTransformPipeline,
    NCropAugmentation,
    build_transform_pipeline,
)
