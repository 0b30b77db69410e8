* RANGES torture: every row type, E rows with BOTH range signs.
* Feasible set: x+y in [4,6], x in [1,4], y in [3,5], x-y in [-3,-2].
* min x+y  ->  x=1, y=3, objective 4.0
NAME          RANGESALL
ROWS
 N  COST
 E  R1
 G  R2
 L  R3
 E  R4
COLUMNS
    X         COST      1.0        R1        1.0
    X         R2        1.0        R4        1.0
    Y         COST      1.0        R1        1.0
    Y         R3        1.0        R4        -1.0
RHS
    RHS       R1        4.0        R2        1.0
    RHS       R3        5.0        R4        -2.0
RANGES
    RNG       R1        2.0        R2        3.0
    RNG       R3        2.0        R4        -1.0
ENDATA
