from .segment import (
    SegmentConfig,
    segment_borders,
    segment_ranges,
    segment_sites_window,
)
