def download_cached_file(*args, **kwargs):
    raise RuntimeError(
        "timm hub downloads are unavailable in the test environment")
