"""Data: datasets (ILSO/SOC/synthetic/folder), host decode pipeline,
on-device augmentation."""
