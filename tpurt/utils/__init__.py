from tpurt.utils.stats import (
    STATS,
    ProfilePhase,
    ProgressReporter,
    StatsRegistry,
    print_stats,
)
