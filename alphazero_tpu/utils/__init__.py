from .schedules import (ConstSchedule, CyclicSchedule, PLSchedule, Schedule,
                        StepSchedule, as_schedule)
