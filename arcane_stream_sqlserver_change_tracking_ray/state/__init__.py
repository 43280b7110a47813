from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (  # noqa: F401
    InvalidWatermarkError,
    Manifest,
    ManifestLog,
)
