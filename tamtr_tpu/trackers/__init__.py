from tamtr_tpu.trackers.byte_tracker import BYTETracker  # noqa: F401
from tamtr_tpu.trackers.bot_sort import BOTSORT  # noqa: F401
