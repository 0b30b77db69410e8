* Negative-UP convention: UP < 0 with no prior LO drops the lower bound
* to -inf; an explicit LO (before the UP) must suppress that.
* min x + 2y  s.t. x+y >= -3, x <= -1 (lb -inf), y in [-2,-1]
* optimum: y=-2, x=-1 -> -5.0
NAME          NEGUP
ROWS
 N  COST
 G  R1
COLUMNS
    X         COST      1.0        R1        1.0
    Y         COST      2.0        R1        1.0
RHS
    RHS       R1        -3.0
BOUNDS
 UP BND       X         -1.0
 LO BND       Y         -2.0
 UP BND       Y         -1.0
ENDATA
