* OBJSENSE on its own line (value on the next) + objective constant via
* an RHS entry on the objective row (enters NEGATED: obj includes -5).
* max 3x + y - 5  s.t. x <= 2, y <= 1, x,y >= 0  ->  optimum 2.0
NAME          OBJMAX
OBJSENSE
    MAXIMIZE
ROWS
 N  COST
 L  R1
COLUMNS
    X         COST      3.0        R1        1.0
    Y         COST      1.0
RHS
    RHS       R1        2.0        COST      5.0
BOUNDS
 UP BND       Y         1.0
ENDATA
