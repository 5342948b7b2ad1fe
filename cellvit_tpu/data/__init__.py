"""Host data layer: datasets, label engineering, sampling, augmentation."""
