"""Offline data pipeline: keypoint transforms, dataset/loader, preprocess
packer, metadata generators, pose-extraction backends."""
