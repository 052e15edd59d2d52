"""Step-scheduled dropout (early/late dropout).

Behavioral reference: ``celldetection/callbacks/dropout.py:8-83`` — switches
model dropout rates on/off at configured step boundaries.

In this framework dropout rate is a module hyperparameter; the scheduler
returns the rate to use at a given step, and the trainer threads it through
``model.core`` rebuilds are unnecessary because linen Dropout reads
``deterministic`` per call — the returned rate can be passed as an override.
"""
__all__ = ['StepDropout']


class StepDropout:
    """Piecewise-constant dropout schedule.

    Args:
        rates: List of (start_step, rate) pairs, sorted by start_step.

    Examples:
        >>> sd = StepDropout([(0, 0.1), (1000, 0.0)])   # disable after 1k steps
        >>> sd(500), sd(2000)
        (0.1, 0.0)
    """

    def __init__(self, rates):
        self.rates = sorted(rates)

    def __call__(self, step: int) -> float:
        current = self.rates[0][1]
        for start, rate in self.rates:
            if step >= start:
                current = rate
        return current
